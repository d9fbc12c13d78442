"""Reference CLI flag-surface parity (agile3d_tpu/cli.py).

A reference user's launch scripts pass the model-hyperparameter block the
reference duplicates across its four entry points (reference main.py:36-55,
eval_multi_obj.py:33-62, eval_single_obj.py:33-65, run_UI.py:30-52). Every
entry point here must accept that full vector and fold it into the typed
Config.
"""

import pytest

from agile3d_tpu.cli import model_config_from_args

# the shared block, with non-default values so mapping is observable
MODEL_FLAGS = [
    "--device", "cuda",
    "--voxel_size", "0.04",
    "--hidden_dim", "64",
    "--dim_feedforward", "256",
    "--num_heads", "4",
    "--num_decoders", "2",
    "--num_bg_queries", "5",
    "--dropout", "0.1",
    "--pre_norm", "t",
    "--normalize_pos_enc", "t",
    "--positional_encoding_type", "fourier",
    "--gauss_scale", "1.5",
    "--hlevels", "4", "4",
    "--shared_decoder", "",
    "--aux", "t",
    "--bn_momentum", "0.05",
    "--dialations", "1", "1", "1", "1",
]


def _parse(parser, extra):
    return parser.parse_args(MODEL_FLAGS + extra)


def test_train_cli_accepts_reference_flags():
    import main as train_cli

    args = _parse(train_cli.get_args_parser(), [
        "--losses", "bce", "dice", "--num_workers", "3",
        "--val_batch_size", "1", "--train_list", "t.json",
        "--ckpt_epochs", "5",
    ])
    assert args.ckpt_epochs == 5
    cfg = train_cli.build_config(args)
    assert cfg.model.hidden_dim == 64
    assert cfg.model.hlevels == (4, 4)
    assert cfg.model.backbone.bn_momentum == 0.05
    assert cfg.model.gauss_scale == 1.5
    assert cfg.loss.losses == ("bce", "dice")
    assert cfg.train.num_workers == 3 and cfg.train.prefetch == 3
    assert cfg.train.val_batch_size == 1


@pytest.mark.parametrize("mod,extra", [
    ("eval_multi_obj", ["--scan_folder", "s", "--val_list", "v",
                        "--train_list", "t", "--num_workers", "2",
                        "--val_batch_size", "1"]),
    ("eval_single_obj", ["--scan_folder", "s", "--val_list", "v",
                         "--train_list", "t", "--num_workers", "2",
                         "--val_batch_size", "1"]),
    ("run_ui", []),
])
def test_other_clis_accept_reference_flags(mod, extra):
    cli = __import__(mod)
    args = _parse(cli.get_args_parser(), extra)
    cfg = model_config_from_args(args)
    assert cfg.voxel_size == 0.04
    assert cfg.num_bg_queries == 5
    assert cfg.backbone.bn_momentum == 0.05


def test_dilations_guard():
    import main as train_cli

    args = train_cli.get_args_parser().parse_args(
        ["--dialations", "1", "2", "1", "1"])
    with pytest.raises(ValueError, match="dialations"):
        model_config_from_args(args)


def test_val_batch_size_guard():
    import eval_multi_obj as cli

    args = cli.get_args_parser().parse_args(
        ["--scan_folder", "s", "--val_list", "v", "--val_batch_size", "2"])
    with pytest.raises(SystemExit, match="val_batch_size"):
        cli.main(args)
