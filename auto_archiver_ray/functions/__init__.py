"""Pure, deterministic per-row kernel functions (the vectorizable core).

Every function here is stateless and safe to call from ``map_batches``
workers. Semantics mirror the reference's utility layer; see each module's
docstring for the ref: citations.
"""

from . import urlkit, hashkit, textkit, timekit, mergekit, keygen  # noqa: F401
