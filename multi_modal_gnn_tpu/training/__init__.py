"""Training: edge splits/masking, jitted train loop, schedulers, checkpoints."""

from multi_modal_gnn_tpu.training.masker import EdgeMasker, SplitBatch  # noqa: F401
from multi_modal_gnn_tpu.training.schedulers import ReduceLROnPlateau, StepLR  # noqa: F401
from multi_modal_gnn_tpu.training.trainer import Trainer, TrainState, train_pipeline  # noqa: F401
from multi_modal_gnn_tpu.training.checkpoint import (  # noqa: F401
    load_checkpoint,
    load_checkpoint_sharded,
    save_checkpoint,
    save_checkpoint_sharded,
)
from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer, build_patient_clusters  # noqa: F401
from multi_modal_gnn_tpu.training.warmstart import (  # noqa: F401
    als_warm_start_params,
    warm_start_trainer,
)
