from .upsert import latest_by_key  # noqa: F401
from .ingest import parse_bizcard_text, bizcards_from_text, graph_from_text  # noqa: F401
