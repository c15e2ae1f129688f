from unet_tpu.train.callbacks import CheckpointManager, EarlyStopping
from unet_tpu.train.losses import (
    balanced_ce_loss,
    create_loss_function,
    cross_entropy_loss,
    deep_supervision_loss,
    dice_bce_loss,
    dice_loss,
)
from unet_tpu.train.metrics import (
    SegmentationMetrics,
    compute_dice,
    compute_iou,
    confusion_matrix_update,
)
from unet_tpu.train.schedules import (
    ReduceLROnPlateau,
    cosine_annealing,
    create_scheduler,
    warmup_cosine,
)
from unet_tpu.train.trainer import (
    EmaState,
    TrainState,
    create_optimizer,
    ema_reinit,
    ema_update,
    init_train_state,
    make_eval_step,
    make_predict_step,
    make_predict_step_u8,
    make_train_step,
)

__all__ = [
    'CheckpointManager', 'EarlyStopping',
    'dice_loss', 'cross_entropy_loss', 'balanced_ce_loss', 'dice_bce_loss',
    'deep_supervision_loss', 'create_loss_function',
    'SegmentationMetrics', 'confusion_matrix_update', 'compute_iou',
    'compute_dice',
    'cosine_annealing', 'warmup_cosine', 'ReduceLROnPlateau',
    'create_scheduler',
    'TrainState', 'EmaState', 'create_optimizer', 'init_train_state',
    'make_train_step', 'make_eval_step', 'make_predict_step',
    'make_predict_step_u8', 'ema_update', 'ema_reinit',
]
