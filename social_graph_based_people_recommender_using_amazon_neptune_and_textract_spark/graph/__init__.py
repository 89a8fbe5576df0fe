from .model import symmetrize, degrees, graph_counts  # noqa: F401
from .pymk import pymk, pymk_all  # noqa: F401
from .queries import one_hop_paths, vertex_lookup, edge_exists, hydrate  # noqa: F401
from .model import truncate  # noqa: F401
from .traverse import shortest_paths  # noqa: F401
