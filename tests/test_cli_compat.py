"""Reference command lines parse verbatim (MIGRATION.md contract).

The reference parses a large flag surface and uses only part of it
(main_v2.py:31-98, main.py:40-122); a user switching frameworks will paste
those command lines unchanged, so every reference flag must be accepted —
honored where meaningful, a documented no-op where the reference itself
ignores it.
"""

import pytest

from speech2affective_gestures_tpu.main_v1 import build_parser as v1_parser
from speech2affective_gestures_tpu.main_v2 import build_parser as v2_parser


# every flag reference main_v2.py defines (with a plausible value)
REFERENCE_V2_ARGV = [
    "-b", "/tmp/base", "-c", "config/multimodal_context_v2.yml",
    "--dataset-s2ag", "ted_db", "--dataset-test", "ted_db",
    "-dap", "True", "--frame-drop", "2", "--train-s2ag", "True",
    "--use-multiple-gpus", "True", "--s2ag-load-last-best", "True",
    "--batch-size", "512", "--num-worker", "4",
    "--s2ag-start-epoch", "290", "--s2ag-num-epoch", "500",
    "--base-tr", "1.0", "--step", "0.05", "0.1",
    "--lr-s2ag-decay", "0.999", "--gradient-clip", "0.1",
    "--nesterov", "True", "--momentum", "0.9", "--weight-decay", "5e-4",
    "--upper-body-weight", "1.0", "--affs-reg", "0.8",
    "--quat-norm-reg", "0.1", "--quat-reg", "1.2", "--recons-reg", "1.2",
    "--val-interval", "1", "--log-interval", "200", "--save-interval", "10",
    "--no-cuda", "--pavi-log", "--print-log", "--save-log",
]

# every flag reference main.py (v1) defines
REFERENCE_V1_ARGV = [
    "-b", "/tmp/base", "-c", "config/multimodal_context_v2.yml",
    "--dataset-ser", "iemocap", "--dataset-s2eg", "ted_db",
    "-dap", "True", "--frame-drop", "2", "--add-mirrored", "False",
    "--train-ser", "False", "--emo-as-cats", "True",
    "--train-s2eg", "False", "--use-multiple-gpus", "True",
    "--ser-load-last-best", "True", "--s2eg-load-last-best", "True",
    "--batch-size", "16", "--num-worker", "4",
    "--ser-start-epoch", "600", "--ser-num-epoch", "5000",
    "--s2eg-start-epoch", "142", "--s2eg-num-epoch", "50000",
    "--ser-optimizer", "Adam", "--base-lr-ser", "1e-3", "--base-tr", "1.0",
    "--step", "0.05", "--lr-ser-decay", "0.999", "--lr-s2eg-decay", "0.999",
    "--gradient-clip", "0.1", "--nesterov", "True", "--momentum", "0.9",
    "--weight-decay", "5e-4", "--upper-body-weight", "1.0",
    "--affs-reg", "0.8", "--quat-norm-reg", "0.1", "--quat-reg", "1.2",
    "--recons-reg", "1.2", "--eval-interval", "1", "--log-interval", "100",
    "--save-interval", "10", "--no-cuda", "--pavi-log",
    "--print-log", "--save-log",
]


def test_v2_reference_command_line_parses():
    args = v2_parser().parse_args(REFERENCE_V2_ARGV)
    # honored flags carry through
    assert args.batch_size == 512
    assert args.train_s2ag is True
    assert args.s2ag_num_epoch == 500
    # parity-default knobs: parsed but not applied unless opted in
    assert args.gradient_clip == 0.1 and args.apply_gradient_clip is False
    assert args.lr_s2ag_decay == 0.999 and args.apply_lr_decay is False


def test_v1_reference_command_line_parses():
    args = v1_parser().parse_args(REFERENCE_V1_ARGV)
    assert args.batch_size == 16
    # aliases map onto the primary flags...
    assert args.optimizer == "Adam"
    assert args.base_lr == 1e-3


def test_v1_aliases_do_not_clobber_defaults():
    args = v1_parser().parse_args(["-b", "/tmp/base", "-c", "x.yml"])
    assert args.base_lr == 1e-3
    assert args.optimizer == "sgd"


def test_unknown_flags_still_rejected():
    with pytest.raises(SystemExit):
        v2_parser().parse_args(["-b", "x", "-c", "y", "--not-a-flag", "1"])
