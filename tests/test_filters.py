"""Unit tests: filters (behavior pinned against reference semantics)."""

from lmms_owc_tpu.filters import get_filter, get_filters_ensemble
from lmms_owc_tpu.tasks import TaskInstance


def _make_instances(resps_per_instance):
    return [
        TaskInstance(
            request_type="generate_until",
            arguments=("ctx", {}, None, i, "t", "test"),
            idx=0,
            metadata={"task": "t", "doc_id": i, "repeats": len(resps)},
            resps=list(resps),
        )
        for i, resps in enumerate(resps_per_instance)
    ]


class TestRegexFilter:
    def test_extract_and_fallback(self):
        f = get_filter("regex")(regex_pattern=r"#### (\-?[0-9\.\,]+)")
        out = f.apply([["#### 42 rest"], ["nothing here"]])
        assert out == [["42"], ["[invalid]"]]

    def test_group_select(self):
        f = get_filter("regex")(regex_pattern=r"(\d+)", group_select=1)
        assert f.apply([["a 1 b 2 c 3"]]) == [["2"]]


class TestMultiChoiceRegex:
    def test_three_stage_fallback(self):
        f = get_filter("multi_choice_regex")(
            regex_pattern=r"\(([A-D])\)", ignore_case=True
        )
        docs = [{"choices": ["cat", "dog", "bird"]}] * 3
        responses = [
            ["The answer is (B)"],          # stage 1: raw regex
            ["I think it's a DOG today"],   # stage 2: choice text
            ["Answer: C"],                  # stage 3: bare letter
        ]
        out = f.apply(responses, docs)
        # Stage 1 extracts the capture group ("B"); stages 2/3 map to "(X)" labels.
        assert out == [["B"], ["(B)"], ["(C)"]]

    def test_fallback_value(self):
        f = get_filter("multi_choice_regex")(regex_pattern=r"\(([A-D])\)")
        out = f.apply([["no match whatsoever"]], [{"choices": ["x", "y"]}])
        assert out == [["[invalid]"]]


class TestSelectionFilters:
    def test_take_first(self):
        f = get_filter("take_first")()
        assert f.apply([["a", "b"], ["c"]]) == ["a", "c"]

    def test_majority_vote(self):
        f = get_filter("majority_vote")()
        assert f.apply([["a", "b", "a"], ["c", "c", "d"]]) == [["a"], ["c"]]

    def test_take_first_k(self):
        f = get_filter("take_first_k")(k=2)
        assert f.apply([["a", "b", "c"]]) == [["a", "b"]]


class TestTransformationFilters:
    def test_lowercase_map(self):
        lower = get_filter("lowercase")()
        assert lower.apply([["AbC"]]) == [["abc"]]
        mapper = get_filter("map")(mapping_dict={"abc": 1}, default_value=0)
        assert mapper.apply([["abc", "zzz"]]) == [[1, 0]]


class TestEnsemble:
    def test_chained_filters_write_filtered_resps(self):
        ensemble = get_filters_ensemble(
            "clean", [("remove_whitespace", None), ("lowercase", None), ("take_first", None)]
        )
        instances = _make_instances([[" The Cat", "dog"], ["BIRD"]])
        ensemble.apply(instances, None)
        assert instances[0].filtered_resps["clean"] == "the cat"
        assert instances[1].filtered_resps["clean"] == "bird"

    def test_default_none_ensemble(self):
        ensemble = get_filters_ensemble("none", [("take_first", None)])
        instances = _make_instances([["first", "second"]])
        ensemble.apply(instances, None)
        assert instances[0].filtered_resps["none"] == "first"
