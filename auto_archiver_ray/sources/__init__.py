"""Sources: seed feeders and the deterministic synthetic pages table."""

from .pages import ensure_pages, pages_path, read_pages  # noqa: F401
