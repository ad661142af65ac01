from olake_spark.plans.ffd import Bin, first_fit_decreasing  # noqa: F401
from olake_spark.plans.lineage import LineageManifest  # noqa: F401
