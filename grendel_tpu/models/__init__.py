from .gaussian_model import (  # noqa: F401
    GaussianParams,
    activated,
    init_from_pcd,
    pad_to_capacity,
    count_alive,
)
from .optimizer import AdamState, adam_init, adam_step, expon_lr, scaled_lrs  # noqa: F401
from .densify import (  # noqa: F401
    DensifyStats,
    densify_stats_init,
    accumulate_densify_stats,
    densify_and_prune,
    reset_opacity,
)
