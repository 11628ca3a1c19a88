"""CLI flag semantics: boolean preset fields must be overridable BOTH ways
(a store_true/default=None flag can never turn a preset's True off)."""

from fastvideotagging_tpu.cli import train as cli_train
from fastvideotagging_tpu.cli.common import build_config


def test_no_multilabel_overrides_preset_true():
    args = cli_train.parse_args(
        ["--preset", "multilabel_tagging_1k", "--no-multilabel"])
    assert build_config(args).model.multilabel is False


def test_multilabel_flag_still_turns_on():
    args = cli_train.parse_args(
        ["--preset", "r2plus1d18_ucf101", "--multilabel"])
    assert build_config(args).model.multilabel is True


def test_omitted_flag_keeps_preset_value():
    args = cli_train.parse_args(["--preset", "multilabel_tagging_1k"])
    assert build_config(args).model.multilabel is True


def test_host_crop_flag_both_ways():
    args = cli_train.parse_args(["--host-crop"])
    assert build_config(args).data.host_crop is True
    args = cli_train.parse_args(["--no-host-crop"])
    assert build_config(args).data.host_crop is False
    # omitted keeps the (False) default
    assert build_config(cli_train.parse_args([])).data.host_crop is False


def test_no_resume_overrides():
    args = cli_train.parse_args(
        ["--preset", "r2plus1d18_ucf101", "--no-resume"])
    assert build_config(args).train.resume is False


def test_multihost_flags_parse_and_validate():
    import pytest

    from fastvideotagging_tpu.cli.common import maybe_init_multihost

    args = cli_train.parse_args(
        ["--coordinator", "10.0.0.1:1234", "--num-processes", "4",
         "--process-id", "2"])
    assert args.coordinator == "10.0.0.1:1234"
    assert (args.num_processes, args.process_id) == (4, 2)

    # incomplete spec fails loudly before touching jax.distributed
    bad = cli_train.parse_args(["--coordinator", "10.0.0.1:1234"])
    with pytest.raises(SystemExit, match="--num-processes"):
        maybe_init_multihost(bad)

    # absent flags: a no-op (the single-host path must not require them)
    maybe_init_multihost(cli_train.parse_args([]))


def test_cpu_devices_requires_platform_cpu():
    import pytest

    from fastvideotagging_tpu.cli.common import apply_platform

    with pytest.raises(SystemExit, match="--platform cpu"):
        apply_platform(cli_train.parse_args(["--cpu-devices", "4"]))
    with pytest.raises(SystemExit, match="--platform cpu"):
        apply_platform(cli_train.parse_args(
            ["--platform", "tpu", "--cpu-devices", "4"]))


def test_evaluate_cli_has_multihost_flags(capsys):
    import pytest

    from fastvideotagging_tpu.cli import evaluate as cli_evaluate

    with pytest.raises(SystemExit):
        cli_evaluate.main(["--help"])
    assert "--coordinator" in capsys.readouterr().out


def test_platform_flag_late_application_fails_loudly():
    """A jax_platforms update after backend init is silently ignored by jax;
    apply_platform must detect the mismatch (here: conftest already
    initialized the cpu backend) rather than run on the wrong backend."""
    import jax
    import pytest

    from fastvideotagging_tpu.cli.common import apply_platform

    # matching platform: fine even post-init
    apply_platform(cli_train.parse_args(["--platform", "cpu"]))
    try:
        with pytest.raises(SystemExit, match="already initialized"):
            apply_platform(cli_train.parse_args(["--platform", "axon"]))
    finally:
        jax.config.update("jax_platforms", "cpu")  # restore for later tests
