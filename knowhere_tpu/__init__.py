"""knowhere_tpu — a TPU-native vector-search (ANN) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Knowhere
(Milvus's C++ ANN core): build/search/range-search/filtered-search/iterator
APIs over FLAT, IVF_*, SCANN, HNSW, DISKANN, sparse inverted, MinHash-LSH and
multi-vector (emb_list) indexes — with the SIMD kernel layer replaced by MXU
matmuls + Pallas kernels, the per-query thread fan-out replaced by device
batching, and multi-chip scale-out via jax.sharding over an ICI mesh.

Public API mirrors the reference surface (see SURVEY.md):

    import knowhere_tpu as kt
    idx = kt.IndexFactory.Instance().Create("IVF_FLAT").value()
    idx.Build(kt.GenDataSetFromArray(xb), {"metric_type": "L2", "nlist": 1024})
    res = idx.Search(kt.GenDataSetFromArray(xq), {"k": 10}, bitset)
    ids = res.value().ids
"""

def _setup_compile_cache() -> None:
    """Persistent XLA compile cache, default ON (KNOWHERE_JAX_CACHE=0 opts
    out). First compilation of each kernel shape costs tens of seconds on
    TPU; serving processes restart, so without a disk cache every restart
    repays the full compile bill (measured: 1M-corpus HNSW build 375s warm
    vs >600s cold). Config-only — does not initialize the JAX backend."""
    import os

    if os.environ.get("KNOWHERE_JAX_CACHE", "1") != "1":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:  # respect user setting
            cache = os.environ.get(
                "KNOWHERE_JAX_CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".cache", "knowhere_tpu", "jax"),
            )
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never block import
        pass


_setup_compile_cache()

from .binaryset import Binary, BinarySet  # noqa: F401
from .bitset import BitsetView  # noqa: F401
from .comp import OpContext  # noqa: F401
from .brute_force import BruteForce  # noqa: F401
from .cluster import Cluster, ClusterFactory  # noqa: F401
from .config import BaseConfig, Config, Entry, Stage, load_config  # noqa: F401
from .dataset import (  # noqa: F401
    DataSet,
    GenDataSet,
    GenDataSetFromArray,
    GenIdsDataSet,
    GenRangeResultDataSet,
    GenResultDataSet,
    GenSparseDataSet,
)
from .factory import IndexFactory, IndexStaticFaced, register_index  # noqa: F401
from .feature import KnowhereCheck, UseDiskLoad, Version, feature  # noqa: F401
from .index import Index, Interrupt  # noqa: F401
from .index_node import (  # noqa: F401
    BatchedDistanceIterator,
    IndexIterator,
    IndexNode,
    PrecomputedDistanceIterator,
)
from .index_param import (  # noqa: F401
    ClusterEnum,
    IndexEnum,
    RefineType,
    VecType,
    indexparam,
    meta,
    metric,
)
from .knowhere_config import KnowhereConfig  # noqa: F401
from .status import (  # noqa: F401
    KnowhereException,
    Status,
    StatusCategory,
    expected,
    status_category_of,
)

# Importing models registers every index family with the factory.
from . import models  # noqa: F401  isort: skip

__version__ = "0.1.0"
