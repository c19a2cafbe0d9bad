"""SVS-compatible registrations (Intel Scalable Vector Search surface).

Parity target: reference src/index/svs/svs_vamana.cc:522-526 + svs_config.h —
SVS_FLAT, SVS_VAMANA (+LVQ/LeanVec quantized variants) with svs_* parameter
names (index_param.h:211-219). The engines are the native TPU ones: SVS_FLAT
is the exact scan; SVS_VAMANA maps its graph knobs onto the flat diversified
graph engine (svs_graph_max_degree -> M, svs_construction_window_size ->
efConstruction, svs_search_window_size -> ef); the LVQ/LeanVec compressed
variants use a real LVQ store (per-vector locally-adaptive grid over the
mean-centred residual, ops/quant.py lvq_*) — LVQ-8 semantics, 1 byte/dim +
2 floats/vector, decoded on-device inside the graph walk.
"""

from __future__ import annotations

from ..config import Entry, Stage, Status
from ..factory import register_index
from ..feature import feature
from ..index_param import IndexEnum
from .flat import FlatIndexNode
from .hnsw import BaseHnswConfig, HnswFlatNode


class SvsVamanaConfig(BaseHnswConfig):
    svs_graph_max_degree = Entry(int, range=(2, 2048), stages=[Stage.TRAIN], allow_empty=True)
    svs_construction_window_size = Entry(int, range=(1, None), stages=[Stage.TRAIN], allow_empty=True)
    svs_search_window_size = Entry(int, range=(1, None), stages=[Stage.SEARCH, Stage.ITERATOR], allow_empty=True)
    svs_search_buffer_capacity = Entry(int, range=(1, None), stages=[Stage.SEARCH], allow_empty=True)
    svs_alpha = Entry(float, range=(0.5, 4.0), stages=[Stage.TRAIN], allow_empty=True)
    svs_storage_kind = Entry(str, stages=[Stage.TRAIN], allow_empty=True)
    svs_leanvec_dim = Entry(int, range=(1, 65536), stages=[Stage.TRAIN], allow_empty=True)

    def check_and_adjust(self, stage):
        st, msg = super().check_and_adjust(stage)
        if st != Status.success:
            return st, msg
        # map svs_* knobs onto the graph engine's knobs
        if self.svs_graph_max_degree is not None:
            object.__setattr__(self, "M", self.svs_graph_max_degree)
        if self.svs_construction_window_size is not None:
            object.__setattr__(self, "efConstruction", self.svs_construction_window_size)
        if self.svs_search_window_size is not None and self.ef is None:
            object.__setattr__(self, "ef", self.svs_search_window_size)
        return Status.success, ""


class SvsVamanaNode(HnswFlatNode):
    @classmethod
    def CreateConfig(cls):
        return SvsVamanaConfig()


class SvsVamanaLvqNode(HnswFlatNode):
    """LVQ compressed storage: per-vector locally-adaptive 8-bit grid
    (reference SVS LVQ — svs_vamana.cc storage kinds), decoded on-device in
    the walk; exact-under-stored-values rerank via the inline fast path."""

    VARIANT = "lvq"

    @classmethod
    def CreateConfig(cls):
        return SvsVamanaConfig()


class SvsVamanaLeanVecNode(HnswFlatNode):
    """LeanVec as the reference means it (svs_vamana.cc:522-526): the graph
    walk scores in a PCA-reduced store at svs_leanvec_dim (default dim/2);
    the candidates rerank at FULL dim from the raw refine payload before
    returning. Round-1's pHNSW experiment rejected a reduced-dim walk
    WITHOUT rerank (recall collapse); with the full-dim rerank the recall
    contract is the reference's (models/hnsw.py VARIANT 'leanvec')."""

    VARIANT = "leanvec"

    @classmethod
    def CreateConfig(cls):
        return SvsVamanaConfig()


_F = feature
_DENSE = ("fp32", "fp16", "bf16", "int8")

register_index(
    IndexEnum.INDEX_SVS_FLAT, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN | _F.NO_TRAIN
)(FlatIndexNode)
register_index(IndexEnum.INDEX_SVS_VAMANA, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN)(SvsVamanaNode)
register_index(IndexEnum.INDEX_SVS_VAMANA_LVQ, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN)(SvsVamanaLvqNode)
register_index(IndexEnum.INDEX_SVS_VAMANA_LEANVEC, _DENSE, _F.ALL_DENSE_TYPE | _F.KNN)(SvsVamanaLeanVecNode)

# hnswlib-era deprecated registration (reference src/index/hnsw/hnsw.cc)
register_index(
    IndexEnum.INDEX_HNSW_DEPRECATED, _DENSE + ("bin1",),
    _F.ALL_DENSE_TYPE | _F.BINARY | _F.KNN,
)(HnswFlatNode)
# faiss-era deprecated registration (reference faiss_hnsw.cc:3255-3261:
# HNSW_DEPRECATED over float-all + int8 + binary)
register_index(
    "HNSW_DEPRECATED", _DENSE + ("bin1",),
    _F.ALL_DENSE_TYPE | _F.BINARY | _F.KNN,
)(HnswFlatNode)
