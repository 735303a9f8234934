from .lineage import PartitionedRun  # noqa: F401
