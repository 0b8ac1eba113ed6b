from .division import (  # noqa: F401
    DivisionHistory,
    divide_rows,
    rows_of_device,
    pack_gt_rows,
)
from .sharded import (  # noqa: F401
    ParallelConfig,
    ShardedTrainer,
)
