"""Speaker embedding banks and batched voice morphing."""

from . import bank, morpher  # noqa: F401
