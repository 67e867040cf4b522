from lowlight_image_enhancement_tpu.training.schedules import (  # noqa: F401
    make_schedule,
    true_cosine_annealing,
    with_warmup,
)
from lowlight_image_enhancement_tpu.training.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    hybrid_batch_kwargs,
    make_eval_step,
    make_optimizer,
    make_train_step,
    put_replicated,
)
