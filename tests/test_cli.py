"""CLI entry-point tests: flag parity, mode dispatch, end-to-end tiny run."""

import sys

import numpy as np
import pytest

from py_psnode_tpu.cli.common import build_parser, main
from py_psnode_tpu.data import write_avr_dataset


def test_parser_flag_parity():
    """The 14 reference flags must all parse (ref script1:204-255)."""
    parser = build_parser()
    args = parser.parse_args(
        [
            "--device", "cpu", "--id", "0", "--training", "--testing",
            "--saving", "--drawing", "--train_data", "a.npz",
            "--test_data", "b.npz", "--model", "m", "--num", "10",
            "--batch", "4", "--hidden", "8", "--epoch", "2", "--step", "11",
        ]
    )
    assert args.training and args.testing and args.saving and args.drawing
    assert args.num == 10 and args.batch == 4 and args.hidden == 8
    assert args.epoch == 2 and args.step == 11


def test_parser_defaults_match_reference():
    args = build_parser().parse_args([])
    assert args.num == 3200 and args.batch == 64 and args.hidden == 128
    assert args.epoch == 400 and args.step == 1001


def test_remat_and_dcn_flags_reach_config(tmp_path, monkeypatch):
    """--remat maps its string values onto the TrainConfig policy (false ->
    False, true -> True, sqrt/adjoint pass through) and --dcn_size 0 means
    'auto' (None)."""
    captured = {}

    class FakeTrainer:
        def __init__(self, cfg):
            captured["cfg"] = cfg

        def train(self):
            return None, None

    import py_psnode_tpu.cli.common as C

    monkeypatch.setattr(C, "Trainer", FakeTrainer)
    base = ["--training", "--train_data", "a.npz", "--test_data", "b.npz"]
    for flag, expect in (
        ("false", False), ("true", True), ("sqrt", "sqrt"),
        ("adjoint", "adjoint"),
    ):
        C.main("ode_no_encode", argv=base + ["--remat", flag])
        assert captured["cfg"].remat == expect, flag
    assert captured["cfg"].dcn_size is None
    C.main("ode_no_encode", argv=base + ["--dcn_size", "2"])
    assert captured["cfg"].dcn_size == 2
    # convergence-recipe knobs reach the config (robust_limit defaults to
    # None = guard default 1.0; gradient_clip None = reference parity no-clip)
    assert captured["cfg"].robust_limit is None
    assert captured["cfg"].gradient_clip is None
    C.main("ode_no_encode", argv=base + [
        "--robust_limit", "5.0", "--gradient_clip", "1.0",
    ])
    assert captured["cfg"].robust_limit == 5.0
    assert captured["cfg"].gradient_clip == 1.0


def test_cli_multishoot_training_end_to_end(tmp_path):
    """--n_windows/--gap_weight reach the trainer: multishoot CLI run
    trains and checkpoints (K=4 windows over a 21-step series: (21-1)%4==0)."""
    train_f, test_f = write_avr_dataset(
        tmp_path / "d", n_train=8, n_test=4, n_steps=21
    )
    main(
        "ode_no_encode",
        argv=[
            "--device", "cpu", "--training",
            "--train_data", str(train_f), "--test_data", str(test_f),
            "--model", str(tmp_path / "m"), "--num", "8", "--batch", "4",
            "--hidden", "8", "--epoch", "1", "--step", "21",
            "--n_windows", "4", "--gap_weight", "0.3",
        ],
    )
    assert (tmp_path / "m" / "model_checkpoint.1").exists()


def test_cli_no_mode_exits():
    with pytest.raises(SystemExit):
        main("ode_no_encode", argv=["--device", "cpu"])


def test_cli_bad_device_exits():
    with pytest.raises(SystemExit):
        main("ode_no_encode", argv=["--device", "quantum", "--training"])


def test_cli_fused_remat_adjoint_rejected():
    """--fused --remat adjoint is a contradiction, not a silent no-op: the
    fused VJP never consults remat (it keeps O(T*state) residuals natively),
    so the explicit adjoint request must error (round-4 verdict weak #3)."""
    with pytest.raises(ValueError, match="fused"):
        main(
            "dae_no_encode",
            argv=[
                "--training", "--train_data", "a.npz", "--test_data",
                "b.npz", "--fused", "--remat", "adjoint",
            ],
        )


def test_cli_fused_remat_sqrt_warns(tmp_path, caplog):
    """Any other explicit remat policy alongside --fused logs an ignored-
    policy warning instead of silently dropping it."""
    import logging

    from py_psnode_tpu.train.trainer import TrainConfig, Trainer

    with caplog.at_level(logging.WARNING, logger="py_psnode_tpu"):
        Trainer(TrainConfig(variant="dae_no_encode", fused=True, remat="sqrt"))
    assert any("ignored on the fused path" in r.message for r in caplog.records)

    # the one fused config that still rides the XLA scan (channel-wise
    # multishoot) keeps remat and must NOT warn
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="py_psnode_tpu"):
        Trainer(TrainConfig(variant="dae_channelwise", fused=True,
                            remat="sqrt", n_windows=20, step=101))
    assert not any(
        "ignored on the fused path" in r.message for r in caplog.records
    )


def test_cli_training_end_to_end(tmp_path):
    train_f, test_f = write_avr_dataset(tmp_path / "d", n_train=12, n_test=6, n_steps=21)
    main(
        "ode_no_encode",
        argv=[
            "--device", "cpu", "--training",
            "--train_data", str(train_f), "--test_data", str(test_f),
            "--model", str(tmp_path / "m"), "--num", "8", "--batch", "4",
            "--hidden", "8", "--epoch", "1", "--step", "21",
        ],
    )
    assert (tmp_path / "m" / "model_checkpoint.1").exists()
    assert (tmp_path / "m" / "training.log").exists()
    # testing mode on the produced checkpoint
    main(
        "ode_no_encode",
        argv=[
            "--device", "cpu", "--testing",
            "--test_data", str(test_f),
            "--model", str(tmp_path / "m" / "model_checkpoint.1"),
            "--hidden", "8",
        ],
    )
    logs = list((tmp_path / "m").glob("Model_*_Evaluation.log"))
    assert logs, "testing mode wrote no evaluation log"
    # testing mode on the run DIRECTORY selects the best-eval checkpoint
    # (here epoch 1, the only one) instead of erroring
    main(
        "ode_no_encode",
        argv=[
            "--device", "cpu", "--testing",
            "--test_data", str(test_f),
            "--model", str(tmp_path / "m"),
            "--hidden", "8",
        ],
    )
