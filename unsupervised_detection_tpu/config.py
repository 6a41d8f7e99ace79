"""Configuration system.

A frozen dataclass backs the CLI flag surface, which keeps the reference's
flag names and defaults bit-for-bit (common_flags.py:1-55) so the public
entry points keep their CLI shape, while adding TPU-native knobs (compute
dtype, mesh shape, Pallas dispatch) that the reference had no equivalent
for. `parse_flags` accepts gflags-style arguments (--name=value, --name
value, --bool/--nobool).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass
class Config:
    # --- Train parameters (common_flags.py:5-25) ---
    img_width: int = 384
    img_height: int = 192
    batch_size: int = 16
    beta1: float = 0.9
    flow_normalizer: float = 80.0
    max_epochs: int = 40
    num_samples_train: int = 5000
    train_crop: float = 0.9
    max_temporal_len: int = 2
    min_temporal_len: int = 1
    cbn: float = 0.5
    epsilon: float = 75.0
    iters_rec: int = 1
    iters_gen: int = 3
    num_threads: int = 6
    resume_train: bool = False

    # --- Path parameters (common_flags.py:27-39) ---
    root_dir: str = "/your/path/to/DAVIS_2016"
    train_partition: str = "trainval"
    dataset: str = "DAVIS2016"
    recover_ckpt: str = ""
    flow_ckpt: str = ""
    full_model_ckpt: str = ""
    checkpoint_dir: str = ""

    # --- Log parameters (common_flags.py:41-45) ---
    summary_freq: int = 30
    save_freq: int = 5

    # --- Testing parameters (common_flags.py:47-55) ---
    generate_visualization: bool = False
    test_crop: float = 0.9
    test_temporal_shift: int = 1
    ckpt_file: str = ""
    test_partition: str = "val"
    test_save_dir: str = ""

    # --- TPU-native extensions (no reference equivalent) ---
    learning_rate: float = 1e-4          # fixed 1e-4 in the reference (adversarial_learner.py:216)
    adam_epsilon: float = 1e-8
    # The reference shares ONE AdamOptimizer between both players, so its
    # bias-correction step t advances on EVERY apply of either net
    # (train/optim.py). True reproduces that; False gives per-net counts.
    adam_shared_step: bool = True
    gradient_clip: float = 0.2           # adversarial_learner.py:227,233
    grad_noise_threshold: float = 1e-5   # loss_utils.py:22
    compute_dtype: str = "float32"       # "bfloat16" for TPU throughput
    use_pallas: bool = False             # fused Pallas kernels for costvol
    # PWC warp formulation (ops/warp.py): "quad" (bit-exact parity default)
    # or "window" (gather-free Pallas kernel on the large levels: same taps
    # up to fp reassociation, runtime-guarded to fall back to quad on any
    # out-of-window flow, differentiable via a quad-backward custom VJP;
    # +10.5% flagship inference fps — see ops/pallas/warp_kernel.py).
    warp_method: str = "quad"
    # PWC internal resolution divisor (1 = reference parity at 640x384;
    # 2 runs the flow net at 320x192, ~3x less flow compute — the mask net
    # consumes standardized flow, so magnitude rescaling cancels).
    flow_resolution_divisor: int = 1
    # PWCNet hyperparameters (reference _DEFAULT_PWCNET_TEST_OPTIONS,
    # model_pwcnet.py:8-19). flow_pred_lvl=3 is a throughput option that
    # skips the most expensive estimator level.
    pwc_pyr_lvls: int = 6
    pwc_flow_pred_lvl: int = 2
    pwc_search_range: int = 4
    # Escape hatch for synthetic/test runs: the reference hard-aborts when no
    # flow checkpoint is given (adversarial_learner.py:339-343); training a
    # random PWC net produces garbage, so we do too unless this is set.
    allow_random_flow: bool = False
    mesh_data: int = 0                   # 0 = all devices on the data axis
    mesh_model: int = 1
    seed: int = 8964                     # train.py:18
    reader_height: int = 384             # PWC input size (davis2016_data_utils.py:86-91)
    reader_width: int = 640
    debug_nans: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_FIELDS = {f.name: f for f in dataclasses.fields(Config)}


def parse_flags(argv, base: Optional[Config] = None) -> Config:
    """Parse gflags-style argv (excluding argv[0]) into a Config."""
    cfg = dataclasses.asdict(base or Config())
    it = iter(argv)
    for raw in it:
        if not raw.startswith("--"):
            raise SystemExit(f"Unrecognized argument: {raw!r}")
        body = raw[2:]
        if "=" in body:
            name, value = body.split("=", 1)
        else:
            name, value = body, None
        # gflags boolean negation: --noresume_train
        if name.startswith("no") and name[2:] in _FIELDS and _FIELDS[name[2:]].type == "bool":
            cfg[name[2:]] = False
            continue
        if name not in _FIELDS:
            raise SystemExit(f"Unknown flag: --{name}")
        field = _FIELDS[name]
        if field.type == "bool":
            if value is None:
                cfg[name] = True
            else:
                cfg[name] = value.lower() in ("1", "true", "t", "yes", "y")
            continue
        if value is None:
            value = next(it, None)
            if value is None:
                raise SystemExit(f"Flag --{name} expects a value")
        caster = {"int": int, "float": float, "str": str}[field.type]
        cfg[name] = caster(value)
    return Config(**cfg)
