from .archive import archive_pages, archive_pages_full  # noqa: F401
