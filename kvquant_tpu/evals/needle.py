"""Needle-in-a-haystack evaluation harness.

Reference: lwm/eval_haystack_pytorch_quant.py:35-392 — a needle sentence is
inserted at a grid of (context length x depth percent) positions inside
haystack text; the model is asked to retrieve it; results are saved to a
resumable JSON so interrupted runs continue where they left off
(:206-212, 294-295). Per-sample cache reset (:266-277) is inherent here:
the engine's generate() starts from a fresh functional cache.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, asdict

import numpy as np

HAYSTACK = (
    "A quiet morning settled over the town as shopkeepers opened their "
    "doors and the smell of bread drifted down the street. "
)
NEEDLE = (
    "The secret ingredient for the winning recipe is {answer}. "
)
QUESTION = (
    " Question: what is the secret ingredient for the winning recipe? "
    "Answer: the secret ingredient is"
)
ANSWERS = [
    "roasted figs", "smoked paprika", "candied ginger", "toasted fennel",
    "black garlic", "preserved lemon", "wild thyme", "burnt honey",
]


@dataclass
class NeedleTrial:
    ctx_tokens: int
    depth_percent: float
    round: int
    answer: str
    response: str
    correct: bool


def build_needle_prompt(tokenizer, ctx_tokens: int, depth_percent: float,
                        answer: str):
    hay_ids = tokenizer.encode(HAYSTACK)
    needle_ids = tokenizer.encode(NEEDLE.format(answer=answer))
    q_ids = tokenizer.encode(QUESTION)

    budget = ctx_tokens - len(needle_ids) - len(q_ids)
    n_fill = budget // len(hay_ids)
    assert n_fill >= 2, "context too small"
    n_before = int(n_fill * depth_percent / 100.0)
    ids = (
        hay_ids * n_before + needle_ids + hay_ids * (n_fill - n_before) + q_ids
    )
    return np.asarray(ids, np.int32)


class NeedleHaystackTester:
    """Grid runner with resumable JSON results (one file per run)."""

    def __init__(
        self,
        generate_fn,  # (prompt_ids (1, T), max_new_tokens) -> token ids
        tokenizer,
        *,
        context_lengths=(2048, 4096, 8192, 16384),
        depth_percents=(0, 25, 50, 75, 100),
        rounds: int = 1,
        results_path: str | None = None,
        seed: int = 0,
        verbose: bool = True,
    ):
        self.generate_fn = generate_fn
        self.tokenizer = tokenizer
        self.context_lengths = context_lengths
        self.depth_percents = depth_percents
        self.rounds = rounds
        self.results_path = results_path
        self.seed = seed
        self.verbose = verbose

    def _load(self) -> list[dict]:
        if self.results_path and os.path.exists(self.results_path):
            with open(self.results_path) as f:
                return json.load(f)
        return []

    def _save(self, results: list[dict]):
        if self.results_path:
            tmp = self.results_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1)
            os.replace(tmp, self.results_path)

    def run(self) -> list[NeedleTrial]:
        results = self._load()
        done = {(r["ctx_tokens"], r["depth_percent"], r["round"])
                for r in results}
        rng = np.random.default_rng(self.seed)

        for ctx in self.context_lengths:
            for depth in self.depth_percents:
                for rd in range(self.rounds):
                    if (ctx, depth, rd) in done:
                        continue
                    answer = ANSWERS[int(rng.integers(len(ANSWERS)))]
                    ids = build_needle_prompt(self.tokenizer, ctx, depth, answer)
                    ans_len = len(self.tokenizer.encode(" " + answer))
                    out = np.asarray(
                        self.generate_fn(ids[None], max_new_tokens=ans_len + 4)
                    ).reshape(-1)
                    response = self.tokenizer.decode([int(t) for t in out])
                    trial = NeedleTrial(
                        ctx_tokens=ctx, depth_percent=depth, round=rd,
                        answer=answer, response=response,
                        correct=answer in response,
                    )
                    results.append(asdict(trial))
                    self._save(results)
                    if self.verbose:
                        print(f"needle ctx={ctx} depth={depth}% "
                              f"round={rd}: {'OK' if trial.correct else 'MISS'}")
        return [NeedleTrial(**r) for r in results]


def accuracy_grid(trials: list[NeedleTrial]):
    """{(ctx, depth): accuracy} summary."""
    agg: dict = {}
    for t in trials:
        key = (t.ctx_tokens, t.depth_percent)
        n, c = agg.get(key, (0, 0))
        agg[key] = (n + 1, c + int(t.correct))
    return {k: c / n for k, (n, c) in agg.items()}
