"""State services (plain Ray actors) the Dataset stages call into: the
sharded URL frontier (seen-filter, politeness, priority, checkpoints)."""

from .bloom import BloomFilter  # noqa: F401
from .frontier import Frontier, FrontierShard  # noqa: F401
