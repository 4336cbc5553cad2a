"""Training runtime: jitted train step, schedule samplers, host loop."""

from .resample import (
    LossSecondMomentState,
    create_named_schedule_sampler,
    init_loss_second_moment,
    sample_loss_second_moment,
    sample_uniform,
    update_loss_second_moment,
)
from .train_loop import (
    TrainLoop,
    TrainState,
    log_loss_dict,
    make_optimizer,
    make_train_step,
)
from .distill import (
    distill_losses,
    distill_phase,
    distill_schedules,
    distill_targets,
    halve_timesteps,
    progressive_distill,
)
