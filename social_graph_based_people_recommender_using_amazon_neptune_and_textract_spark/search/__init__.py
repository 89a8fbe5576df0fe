from .index import tokenize, build_index  # noqa: F401
from .bm25 import bm25_scores, K1, B  # noqa: F401
from .api import (  # noqa: F401
    search_bizcards,
    search_documents,
    search_envelope,
    search_or_404,
    search_response,
)
