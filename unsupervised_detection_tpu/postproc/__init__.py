from .soft_score import buffer_to_soft_score, rectify_pred_mask, sanity_check
from .propagate import propagate_sequences, warp_with_flow
from .crf import run_crf, refine_mask
