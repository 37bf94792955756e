"""Parallelism layer (alias of ``pautdx.mesh``).

Data parallelism over a 1-axis ``dp`` mesh is the framework's deliberate
scaling story (SURVEY.md §2.9: the reference is single-GPU; models are
<=50M params so tp/pp/sp/ep add nothing here). The mesh/sharding helpers
live in ``pautdx.mesh``; this package is the conventional import point.
"""

from pautdx.mesh import (  # noqa: F401
    batch_sharding, make_mesh, pad_to_multiple, replicated, shard_batch,
)
