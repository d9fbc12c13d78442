"""Shared reference CLI flag surface.

The reference duplicates one identical model-hyperparameter argparse block
across its four entry points (reference main.py:36-55, eval_multi_obj.py:
37-58, eval_single_obj.py:37-61, run_UI.py:30-52). Those flags are part of
the switching surface — a reference user's launch scripts pass them — so
every entry point here accepts the full set. They are registered ONCE by
:func:`add_reference_model_flags` and folded into the typed config by
:func:`model_config_from_args` (fixing the duplication SURVEY.md section
5.6 calls out, without shrinking the accepted surface).
"""

from __future__ import annotations

import argparse

from agile3d_tpu.config import BackboneConfig, ModelConfig


def add_reference_model_flags(p: argparse.ArgumentParser) -> None:
    """Register the reference's shared model flag block (main.py:36-55).

    ``type=bool`` flags keep the reference's (quirky) argparse semantics:
    any non-empty value parses truthy, matching what reference users'
    scripts rely on.
    """
    p.add_argument("--device", default="", type=str,
                   help="'cpu' forces the CPU backend (the reference's CPU "
                        "mode, installation_cpu.md); default = whatever "
                        "jax picked (TPU here, 'cuda' is accepted and "
                        "means the accelerator)")
    p.add_argument("--voxel_size", default=0.05, type=float)
    p.add_argument("--hidden_dim", default=128, type=int)
    p.add_argument("--dim_feedforward", default=1024, type=int)
    p.add_argument("--num_heads", default=8, type=int)
    p.add_argument("--num_decoders", default=3, type=int)
    p.add_argument("--num_bg_queries", default=10, type=int)
    p.add_argument("--dropout", default=0.0, type=float)
    p.add_argument("--pre_norm", default=False, type=bool)
    p.add_argument("--normalize_pos_enc", default=True, type=bool)
    p.add_argument("--positional_encoding_type", default="fourier")
    p.add_argument("--gauss_scale", default=1.0, type=float)
    p.add_argument("--hlevels", default=[4], type=int, nargs="+")
    p.add_argument("--shared_decoder", default=False, type=bool)
    p.add_argument("--aux", default=True, type=bool)
    p.add_argument("--bn_momentum", default=0.02, type=float)
    p.add_argument("--conv1_kernel_size", default=5, type=int)
    # the reference's spelling (reference main.py:36 '--dialations')
    p.add_argument("--dialations", default=[1, 1, 1, 1], type=int,
                   nargs="+")


def model_config_from_args(args, **overrides) -> ModelConfig:
    """Fold the shared reference flags into a typed ModelConfig.

    ``overrides`` are entry-point-specific ModelConfig fields with no
    reference analogue (max_clicks, decoder_dtype, ...).
    """
    dilations = tuple(args.dialations)
    if any(d != 1 for d in dilations):
        raise ValueError(
            f"--dialations {list(dilations)}: only undilated kernels are "
            "supported — the reference never runs any other value (its "
            "default [1,1,1,1] is the only configuration its shipped "
            "models and scripts use, reference main.py:36)")
    if args.conv1_kernel_size != 5:
        raise ValueError(
            f"--conv1_kernel_size {args.conv1_kernel_size}: only 5 is "
            "supported — the data pipeline pre-builds the stem's 125-column "
            "gather map (sparse/kernel_maps.build_pyramid stem_kernel=5), "
            "and the reference never runs any other value (its default 5 is "
            "the only configuration its shipped models use, reference "
            "main.py:37)")
    backbone = overrides.pop("backbone", None) or BackboneConfig(
        bn_momentum=args.bn_momentum, dilations=dilations,
        conv1_kernel_size=args.conv1_kernel_size)
    return ModelConfig(
        hidden_dim=args.hidden_dim,
        dim_feedforward=args.dim_feedforward,
        num_heads=args.num_heads,
        num_decoders=args.num_decoders,
        num_bg_queries=args.num_bg_queries,
        dropout=args.dropout,
        pre_norm=args.pre_norm,
        normalize_pos_enc=args.normalize_pos_enc,
        positional_encoding_type=args.positional_encoding_type,
        gauss_scale=args.gauss_scale,
        hlevels=tuple(args.hlevels),
        shared_decoder=args.shared_decoder,
        aux=args.aux,
        voxel_size=args.voxel_size,
        backbone=backbone,
        **overrides)


def apply_device_arg(args) -> None:
    """Honor --device before any jax computation. 'cpu' switches the
    backend (the reference's CPU mode); anything else ('', 'cuda', ...)
    keeps jax's pick — on this stack that is the TPU."""
    if getattr(args, "device", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
