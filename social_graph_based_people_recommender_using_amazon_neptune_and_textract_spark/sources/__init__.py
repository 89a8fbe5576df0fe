from .tables import (  # noqa: F401
    TABLES,
    load_table,
    user_graph_edges,
    user_graph_vertices,
    bizcard_text_records,
    EDGES_SQL,
    VERTICES_SQL,
    BIZCARD_LINES_SQL,
)
