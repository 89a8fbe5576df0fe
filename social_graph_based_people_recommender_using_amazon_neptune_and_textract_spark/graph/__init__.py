from .model import symmetrize, degrees, graph_counts  # noqa: F401
from .pymk import pymk, pymk_all, pymk_hydrated, pymk_scored  # noqa: F401
from .queries import (  # noqa: F401
    edge_exists,
    hydrate,
    hydrate_valuemap,
    one_hop_paths,
    vertex_lookup,
)
from .model import truncate  # noqa: F401
from .traverse import shortest_paths  # noqa: F401
