from olake_spark.functions.hashing import (  # noqa: F401
    bucket_int_udf,
    bucket_string_udf,
    mmh3_32_bytes,
    mmh3_32_long,
    pk_hash_col,
)
from olake_spark.functions.transforms import (  # noqa: F401
    day_transform,
    hour_transform,
    month_transform,
    partition_path,
    truncate_int,
    truncate_string,
    year_transform,
)
from olake_spark.functions.zcurve import (  # noqa: F401
    hilbert_d2xy,
    hilbert_key_udf,
    hilbert_xy2d,
    morton3,
    zorder_key_udf,
)
