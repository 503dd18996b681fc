"""CLI pipeline smoke test: fisher -> calibrate -> eval_ppl -> deploy
--check, all on a toy random-init model with synthetic data (the reference's
5-stage pipeline driven end-to-end, SURVEY.md §1)."""

import sys

import pytest


TOY = ["--toy-layers", "2", "--toy-dmodel", "64", "--toy-heads", "4",
       "--toy-vocab", "256", "--nsamples", "2", "--seqlen", "64"]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    fisher = str(d / "fisher.npz")
    quant = str(d / "quantizers.npz")

    from kvquant_tpu.cli import fisher as fisher_cli
    from kvquant_tpu.cli import calibrate as calibrate_cli

    fisher_cli.main(TOY + ["--output", fisher])
    calibrate_cli.main(
        TOY + ["--abits", "3", "--fisher", fisher, "--output", quant,
               "--kmeans-iters", "8"]
    )
    return fisher, quant


def test_eval_ppl(artifacts, capsys):
    from kvquant_tpu.cli import eval_ppl

    _, quant = artifacts
    ppl = eval_ppl.main(TOY + ["--quantizers", quant, "--max-windows", "2"])
    assert ppl > 0
    out = capsys.readouterr().out
    assert "quantized ppl" in out


def test_eval_ppl_fp16_baseline(artifacts):
    from kvquant_tpu.cli import eval_ppl

    ppl = eval_ppl.main(TOY + ["--max-windows", "2"])
    assert ppl > 0


def test_deploy_check(artifacts, capsys):
    from kvquant_tpu.cli import deploy

    _, quant = artifacts
    deploy.main(
        TOY + ["--quantizers", quant, "--benchmark", "8", "--kernel", "xla"]
    )
    out = capsys.readouterr().out
    assert "deployed ppl" not in out  # no --check
    assert "tok/s" in out


def test_generate(artifacts, capsys):
    from kvquant_tpu.cli import generate

    _, quant = artifacts
    generate.main(
        ["--toy-layers", "2", "--toy-dmodel", "64", "--toy-heads", "4",
         "--toy-vocab", "256", "--quantizers", quant, "--kernel", "xla",
         "--prompt", "a b c d e f g h i j", "--max-new-tokens", "4"]
    )
    assert capsys.readouterr().out.strip()


def test_deploy_check_channels(artifacts, capsys):
    """--k-outliers channels threads through the CLI into both the
    deployed config AND the simulated oracle (--check)."""
    from kvquant_tpu.cli import deploy

    _, quant = artifacts
    deploy.main(
        TOY + ["--quantizers", quant, "--benchmark", "4", "--kernel", "xla",
               "--check", "--k-outliers", "channels", "--n-kc", "2"]
    )
    out = capsys.readouterr().out
    assert "simulated ppl" in out and "deployed ppl" in out
