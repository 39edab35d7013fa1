from .configs import (
    ViTConfig, VTAMIQConfig, get_vit_config,
    VIT_VARIANT_B8, VIT_VARIANT_B16, VIT_VARIANT_L16,
)
from .vit import init_vit_params, vit_forward, load_vit_npz
from .vtamiq import (
    init_vtamiq_params, vtamiq_forward, vtamiq_forward_single_tower,
)
from .preference import init_preference_params, preference_forward, preference_sigmoid
from .checkpoint import (
    save_checkpoint, load_checkpoint, merge_params, apply_pretraining_gates,
    restore_opt_state, MODEL_STATE_DICT, PREF_MODULE_STATE_DICT,
)
