"""Index families. Importing this package registers every index with the
factory (the module-level @register_index decorators are the analog of the
reference's static-init registration macros, index_factory.h:87-165)."""

from . import (  # noqa: F401
    cagra,
    data_view,
    diskann,
    emb_list,
    faiss_generic,
    flat,
    hnsw,
    ivf,
    minhash,
    sharded,
    sparse,
    svs,
)
