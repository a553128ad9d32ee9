"""Unit tests: instance metrics, aggregations, bootstrap stderr."""

import math

import numpy as np
import pytest

from lmms_owc_tpu import metrics
from lmms_owc_tpu.metrics._api import bootstrap_stderr, mean_stderr
from lmms_owc_tpu.metrics._group import mean, median, perplexity, weighted_perplexity
from lmms_owc_tpu.metrics._instance import anls, exact_match, textual_inclusion


class TestExactMatch:
    def test_basic(self):
        out = exact_match(predictions=["cat", "dog"], references=["cat", "bird"])
        assert out == {"exact_match": 0.5}

    def test_ignore_case_and_regexes(self):
        out = exact_match(
            predictions=["The Cat,"], references=["the cat"],
            regexes_to_ignore=[","], ignore_case=True,
        )
        assert out["exact_match"] == 1.0

    def test_ignore_punctuation_numbers(self):
        out = exact_match(
            predictions=["cat!123"], references=["cat"],
            ignore_punctuation=True, ignore_numbers=True,
        )
        assert out["exact_match"] == 1.0


class TestTextualInclusion:
    def test_substring(self):
        out = textual_inclusion(
            predictions=["a photo of a red panda sitting"], references=["red panda"]
        )
        assert out["textual_inclusion"] == 1.0

    def test_case_insensitive(self):
        out = textual_inclusion(predictions=["RED PANDA"], references=["red panda"])
        assert out["textual_inclusion"] == 1.0

    def test_miss(self):
        out = textual_inclusion(predictions=["a dog"], references=["red panda"])
        assert out["textual_inclusion"] == 0.0


class TestAnls:
    def test_exact(self):
        assert anls(references=["hello"], predictions=["hello"])["anls"] == 1.0

    def test_below_threshold_zeroed(self):
        assert anls(references=["abcdef"], predictions=["zzzzzz"])["anls"] == 0

    def test_close_match(self):
        score = anls(references=["hello"], predictions=["hallo"])["anls"]
        assert score == pytest.approx(0.8)


class TestAggregations:
    def test_mean_median(self):
        assert mean([1, 2, 3]) == 2.0
        assert median([1, 2, 3]) == 2  # index len//2, reference quirk: no sorting

    def test_perplexities(self):
        assert perplexity([-1.0, -1.0]) == pytest.approx(math.e)
        assert weighted_perplexity([(-2.0, 2), (-2.0, 2)]) == pytest.approx(math.e)

    def test_bleu_chrf_ter(self):
        # Items arrive as ([refs...], [preds...]) pairs from the engine's metric protocol.
        items = [("the cat sat on the mat", ["the cat sat on the mat"])] * 3
        assert metrics.get_aggregation("bleu", items=items) == pytest.approx(100.0)
        assert metrics.get_aggregation("chrf", items=items) == pytest.approx(100.0)
        assert metrics.get_aggregation("ter", items=items) == pytest.approx(0.0)

    def test_f1_mcc(self):
        items = [(1, 1), (0, 0), (1, 1), (0, 1)]
        assert metrics.get_aggregation("f1", items=items) == pytest.approx(0.8)
        assert metrics.get_aggregation("matthews_corrcoef", items=items) == pytest.approx(
            0.5773502691896258
        )

    def test_brier(self):
        items = [(0, [0.9, 0.1]), (1, [0.2, 0.8])]
        expected = np.mean([(0.9 - 1) ** 2 + 0.1**2, 0.2**2 + (0.8 - 1) ** 2])
        assert metrics.get_aggregation("brier_score", items=items) == pytest.approx(expected)

    def test_bypass(self):
        assert metrics.get_aggregation("bypass", arr=[1, 2]) == 999


class TestSemanticSimilarity:
    """Runs on the deterministic fallback encoder (no MiniLM weights in CI)."""

    def test_identical_strings_score_one(self):
        items = [("red panda", "red panda"), ("blue jay", "blue jay")]
        score = metrics.get_aggregation("semantic_similarity", items=items)
        assert score == pytest.approx(1.0, abs=1e-5)

    def test_reduce_none_returns_per_sample(self):
        items = [("red panda", "red panda"), ("blue jay", "a dog")]
        scores = metrics.get_aggregation("semantic_similarity", items=items, reduce="none")
        assert len(scores) == 2
        assert scores[0] == pytest.approx(1.0, abs=1e-5)
        assert scores[1] < 0.9

    def test_concept_similarity_runs(self):
        items = [
            ("red panda", "a photo of a red panda in a tree"),
            ("blue jay", "this is a blue jay"),
        ]
        score = metrics.get_aggregation("concept_semantic_similarity", items=items)
        assert 0.0 <= score <= 1.0 + 1e-6

    def test_concept_similarity_none_shape(self):
        items = [("red panda", "a red panda")]
        out = metrics.get_aggregation(
            "concept_semantic_similarity", items=items, reduce="none"
        )
        concepts, sims = out[0]
        assert len(concepts) == len(sims)
        # The full prediction is always appended as a concept.
        assert concepts[-1] == "a red panda"

    def test_mean_average_semantic_similarity_keys(self):
        items = [("red panda", "red panda")]
        out = metrics.get_aggregation("mean_average_semantic_similarity", items=items)
        assert set(out) == {
            "semantic_similarity@0.5", "semantic_similarity@0.6", "semantic_similarity@0.7",
            "semantic_similarity@0.8", "semantic_similarity@0.9", "semantic_similarity@avg",
        }
        assert out["semantic_similarity@avg"] == pytest.approx(1.0)


class TestStderr:
    def test_mean_stderr(self):
        xs = [0, 1, 0, 1]
        expected = np.std(xs, ddof=1) / np.sqrt(len(xs))
        assert mean_stderr(xs) == pytest.approx(expected)

    def test_bootstrap_deterministic(self):
        xs = [0.0, 1.0, 0.5, 0.25, 0.75] * 4
        a = bootstrap_stderr(mean, xs, iters=1000)
        b = bootstrap_stderr(mean, xs, iters=1000)
        assert a == b
        assert 0 < a < 0.2

    def test_stderr_builder_dispatch(self):
        fn = metrics.get_metric_stderr_builder(mean, bootstrap_iters=1000)
        assert fn is mean_stderr
        # Reference parity: bleu/chrf/ter aggregations are not bootstrap-registered,
        # so their stderr reports "N/A" (the reference's name-vs-callable comparison
        # never matches either — observable behavior is identical).
        bleu_agg = metrics.get_aggregation_builder("bleu")
        assert metrics.get_metric_stderr_builder(bleu_agg, bootstrap_iters=10) is None
        # The median aggregation IS bootstrap-capable.
        median_agg = metrics.get_aggregation_builder("median")
        fn = metrics.get_metric_stderr_builder(median_agg, bootstrap_iters=100)
        assert fn is not None and fn([0.1, 0.5, 0.9] * 5) > 0
        assert metrics.get_metric_stderr_builder(mean, bootstrap_iters=0) is None


class TestRegistry:
    def test_metric_inventory(self):
        expected = {
            "acc", "acc_all", "acc_mutual_info", "acc_norm", "anls", "bits_per_byte",
            "bleu", "brier_score", "bypass", "byte_perplexity", "chrf",
            "concept_semantic_similarity", "exact_match", "f1", "mcc",
            "mean_average_semantic_similarity", "perplexity", "semantic_similarity",
            "ter", "textual_inclusion", "textual_inclusion_llama32", "word_perplexity",
        }
        assert expected <= set(metrics.METRICS)

    def test_aggregation_inventory(self):
        expected = {
            "bits_per_byte", "bleu", "brier_score", "bypass", "chrf",
            "concept_semantic_similarity", "f1", "matthews_corrcoef", "mean",
            "mean_average_semantic_similarity", "median", "perplexity",
            "semantic_similarity", "ter", "textual_inclusion_llama32",
            "weighted_perplexity",
        }
        assert expected <= set(metrics.AGGREGATIONS)

    def test_default_metrics_per_output_type(self):
        assert metrics.DEFAULT_METRICS_PER_OUTPUT_TYPE["generate_until"] == ["exact_match"]
        assert metrics.DEFAULT_METRICS_PER_OUTPUT_TYPE["multiple_choice"] == ["acc", "acc_norm"]
