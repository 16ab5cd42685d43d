"""auto_archiver_ray — a Ray-Data-native rebuild of bellingcat/auto-archiver.

A URL-frontier + fetch/extract/enrich engine expressed as ``ray.data.Dataset``
pipelines of ``map_batches`` over zero-copy Arrow batches, with sharded actor
state for the frontier (URL-seen filter, politeness, robots, priority,
checkpoints).

Reference behavior studied from /root/reference (auto-archiver v1.2.7); this
is a from-scratch Ray-Data-first design, not a port. Reference citations in
docstrings use the form ``ref:<path>:<lines>`` relative to
``/root/reference/src/auto_archiver/``.
"""

__version__ = "0.1.0"
