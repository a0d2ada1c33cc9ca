"""AVC training: jitted train/eval steps under pjit data parallelism,
checkpoint/resume, history artifacts, async input pipeline."""

from .state import AVCTrainState, create_train_state  # noqa: F401
from .steps import make_eval_step, make_train_step, preprocess_batch  # noqa: F401
