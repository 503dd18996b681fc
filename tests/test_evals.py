"""Harness tests for data loaders, passkey, and needle-in-haystack evals —
validated with an oracle retriever (a generate_fn that actually looks up the
needle in its prompt), so scoring, prompt construction, depth placement, and
resume logic are exercised without a trained model."""

import json

import numpy as np

from kvquant_tpu.data import get_loaders, synthetic_stream, calibration_windows
from kvquant_tpu.evals.passkey import build_passkey_prompt, eval_passkey
from kvquant_tpu.evals.needle import (
    NeedleHaystackTester, build_needle_prompt, accuracy_grid,
)
from kvquant_tpu.utils.toytokenizer import WordTokenizer


class TestData:
    def test_synthetic_deterministic(self):
        a = synthetic_stream(1000, 5000, seed=3)
        b = synthetic_stream(1000, 5000, seed=3)
        np.testing.assert_array_equal(a, b)
        assert a.min() >= 0 and a.max() < 1000

    def test_loaders_shapes(self):
        train, test = get_loaders("synthetic", nsamples=4, seqlen=128,
                                  vocab_size=500, eval_tokens=1024)
        assert train.shape == (4, 128)
        assert test.shape[1] == 128 and test.shape[0] >= 1

    def test_windows_seeded(self):
        s = synthetic_stream(100, 10000)
        w1 = calibration_windows(s, 3, 64, seed=1)
        w2 = calibration_windows(s, 3, 64, seed=1)
        np.testing.assert_array_equal(w1, w2)


def oracle_generate(tok):
    """Answers by scanning its own prompt for the marker phrase — retrieval
    made perfect, so harness accuracy must be 1.0."""

    def fn(prompt_ids, max_new_tokens):
        text = tok.decode([int(t) for t in prompt_ids.reshape(-1)])
        words = text.split()
        # find "pass key is X" or "recipe is X Y"
        for i, w in enumerate(words):
            if w == "is" and i + 1 < len(words) and any(
                ch.isdigit() for ch in words[i + 1]
            ):
                ans = words[i + 1]
                return np.asarray(tok.encode(ans + " end")[:max_new_tokens])
        for i in range(len(words) - 1):
            if words[i] == "recipe" and words[i + 1] == "is":
                ans = " ".join(words[i + 2:i + 4])
                return np.asarray(tok.encode(ans)[:max_new_tokens])
        return np.zeros(max_new_tokens, np.int32)

    return fn


class TestPasskey:
    def test_prompt_depth_placement(self):
        tok = WordTokenizer()
        ids, ans = build_passkey_prompt(tok, 512, 12345, depth=0.0)
        text = tok.decode(list(ids))
        assert "12345." in text or "12345" in text
        # at depth 0 the needle is near the front
        assert text.index("12345") < len(text) * 0.3
        ids2, _ = build_passkey_prompt(tok, 512, 12345, depth=1.0)
        text2 = tok.decode(list(ids2))
        assert text2.index("12345") > len(text2) * 0.6
        assert abs(len(ids) - 512) < 60

    def test_oracle_gets_perfect_accuracy(self):
        tok = WordTokenizer()
        res = eval_passkey(
            oracle_generate(tok), tok, ctx_lengths=(256, 512), n_trials=5,
            verbose=False,
        )
        assert all(r.accuracy == 1.0 for r in res)


class TestNeedle:
    def test_grid_and_resume(self, tmp_path):
        tok = WordTokenizer()
        path = str(tmp_path / "results.json")
        t = NeedleHaystackTester(
            oracle_generate(tok), tok, context_lengths=(256, 512),
            depth_percents=(0, 50, 100), rounds=1, results_path=path,
            verbose=False,
        )
        trials = t.run()
        assert len(trials) == 6
        grid = accuracy_grid(trials)
        assert all(v == 1.0 for v in grid.values())

        # resume: results file is reused, no re-evaluation
        with open(path) as f:
            before = json.load(f)
        calls = {"n": 0}
        orig = oracle_generate(tok)

        def counting(prompt_ids, m):
            calls["n"] += 1
            return orig(prompt_ids, m)

        t2 = NeedleHaystackTester(
            counting, tok, context_lengths=(256, 512),
            depth_percents=(0, 50, 100), rounds=1, results_path=path,
            verbose=False,
        )
        trials2 = t2.run()
        assert calls["n"] == 0 and len(trials2) == len(before)

    def test_needle_depth(self):
        tok = WordTokenizer()
        ids = build_needle_prompt(tok, 512, 0, "black garlic")
        text = tok.decode(list(ids))
        assert text.index("black garlic") < len(text) * 0.3
