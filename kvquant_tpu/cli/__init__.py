"""Command-line entry points.

Reference CLI surface -> TPU-native equivalent:
  gradients/run-fisher.py        -> python -m kvquant_tpu.cli.fisher
  quant/llama_simquant.py        -> python -m kvquant_tpu.cli.calibrate
                                    python -m kvquant_tpu.cli.eval_ppl
  deployment/llama.py            -> python -m kvquant_tpu.cli.deploy
  lwm/llama_inference.py         -> python -m kvquant_tpu.cli.generate
  quant/eval_passkey_simquant.py -> python -m kvquant_tpu.cli.passkey
  lwm/eval_haystack_...py        -> python -m kvquant_tpu.cli.needle
"""
