from .correlations import (
    compute_correlations,
    compute_correlations_flat,
    average_over_repeats,
    SROCC_FIELD, KROCC_FIELD, PLCC_FIELD, RMSE_FIELD,
    PLCC_NOFIT_FIELD, RMSE_NOFIT_FIELD, CORRELATION_FIELDS,
)
from .fitting import FitFunction, fit_values
from .values import normalize_values, reverse_values, linearize_values, process_qs, normalize_array
from .losses import (
    mae_loss, mse_loss, pears_loss, rank_loss, spearman_loss,
    loss_func_iqa, loss_func_pairwise,
)
from .sampling import (
    PatchSampler,
    GRID_TYPE_HALTON, GRID_TYPE_PERTURBED, GRID_TYPE_PERTURBED_SIMPLE,
    DIFF_TYPE_MAGNITUDE, DIFF_TYPE_DARK, DIFF_TYPE_MSE, DIFF_TYPE_SSIM,
    ssim_map,
    DEFAULT_NUM_SAMPLES_RATIO,
    compute_patch_num_scales, compute_num_patches_per_scale,
    compute_diff_map, halton_2d,
)
from .extraction import get_iqa_patches, gather_patches, avgpool2x
