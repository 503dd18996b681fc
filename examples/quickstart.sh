#!/usr/bin/env bash
# End-to-end pipeline on a toy random-init model with synthetic data
# (zero-egress friendly). With a local HF checkpoint, replace the --toy-*
# flags with --model /path/to/safetensors_dir everywhere.
set -euo pipefail
cd "$(dirname "$0")/.."

TOY="--toy-layers 2 --toy-dmodel 256 --toy-heads 8 --toy-vocab 1000 --nsamples 4 --seqlen 256"

echo "== 1. Fisher information =="
python -m kvquant_tpu.cli.fisher $TOY --output /tmp/fisher.npz

echo "== 2. Calibrate 3-bit NUQ quantizers (Fisher-weighted k-means) =="
python -m kvquant_tpu.cli.calibrate $TOY --abits 3 --fisher /tmp/fisher.npz \
    --output /tmp/quantizers.npz

echo "== 3. Simulated-quantization perplexity (+ deployed check) =="
python -m kvquant_tpu.cli.eval_ppl $TOY --quantizers /tmp/quantizers.npz \
    --max-windows 2 --deployed

echo "== 4. Deployed decode benchmark =="
python -m kvquant_tpu.cli.deploy $TOY --quantizers /tmp/quantizers.npz \
    --benchmark 32 --prefill 128 --check

echo "== 5. Generation =="
python -m kvquant_tpu.cli.generate --toy-layers 2 --toy-dmodel 256 \
    --toy-heads 8 --toy-vocab 1000 --quantizers /tmp/quantizers.npz \
    --prompt "a b c d e f g h" --max-new-tokens 16

echo "== 6. Continuous-batching serving demo =="
python -m kvquant_tpu.cli.serve_demo --toy-layers 2 --toy-dmodel 256 \
    --toy-heads 8 --toy-vocab 1000 --quantizers /tmp/quantizers.npz \
    --slots 4 --requests 6 --prompt-len 32 --max-new-tokens 8
