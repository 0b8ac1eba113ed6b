from .render import RenderConfig, render_image, render_batch  # noqa: F401
from .loss import camera_loss, batch_loss  # noqa: F401
from .train import TrainState, XyzLrSchedule, train_state_init, train_step  # noqa: F401
