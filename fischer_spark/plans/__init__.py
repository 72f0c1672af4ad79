from fischer_spark.plans.lineage import read_lineage, with_lineage
from fischer_spark.plans.pipeline import RollupPipeline

__all__ = ["with_lineage", "read_lineage", "RollupPipeline"]
