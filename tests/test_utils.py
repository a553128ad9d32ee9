"""Unit tests: core utils, YAML config loader, collator."""

import random

import pytest

from lmms_owc_tpu import utils


class TestCreateIterator:
    def test_single_rank(self):
        assert list(utils.create_iterator(range(10), 0, 1)) == list(range(10))

    def test_sharding(self):
        r0 = list(utils.create_iterator(range(10), 0, 3))
        r1 = list(utils.create_iterator(range(10), 1, 3))
        r2 = list(utils.create_iterator(range(10), 2, 3))
        assert r0 == [0, 3, 6, 9]
        assert r1 == [1, 4, 7]
        assert r2 == [2, 5, 8]
        assert sorted(r0 + r1 + r2) == list(range(10))

    def test_limit(self):
        assert list(utils.create_iterator(range(10), 0, 2, limit=6)) == [0, 2, 4]


class TestParseStringArgs:
    def test_basic(self):
        assert utils.parse_string_args("a=1,b=x,c=true,d=2.5,e=None") == {
            "a": 1, "b": "x", "c": True, "d": 2.5, "e": None,
        }

    def test_empty(self):
        assert utils.parse_string_args("") == {}
        assert utils.parse_string_args(None) == {}


class TestPatternMatch:
    def test_exact_and_wildcard(self):
        source = ["caltech101", "caltech101_caption", "dtd", "dtd_caption"]
        assert utils.pattern_match("dtd", source) == ["dtd"]
        assert utils.pattern_match(["caltech101*"], source) == [
            "caltech101", "caltech101_caption",
        ]

    def test_no_duplicates(self):
        assert utils.pattern_match(["dtd", "dtd*"], ["dtd"]) == ["dtd"]


class TestYamlConfig:
    def test_include_merge(self, toy_task_path):
        config = utils.load_yaml_config(f"{toy_task_path}/toy/toy.yaml")
        assert config["task"] == "toy"
        # Included template provides the dataset path and metric_list...
        assert config["dataset_path"].endswith("data/toy")
        assert any(m["metric"] == "exact_match" for m in config["metric_list"])
        # ...while the including file wins on overlapping keys.
        assert config["generation_kwargs"]["max_new_tokens"] == 16

    def test_function_tag_resolution(self, toy_task_path):
        config = utils.load_yaml_config(f"{toy_task_path}/toy/toy.yaml")
        assert callable(config["doc_to_text"])
        assert config["doc_to_text"]({}, {"prompt": "Hi"}) == "Hi"

    def test_simple_mode_keeps_spec_strings(self, toy_task_path):
        config = utils.load_yaml_config(f"{toy_task_path}/toy/toy.yaml", mode="simple")
        assert isinstance(config["doc_to_text"], str)

    def test_jinja(self):
        assert utils.apply_jinja_template("{{question}} A?", {"question": "Q"}) == "Q A?"
        assert (
            utils.apply_jinja_template("{{x | regex_replace('b+', 'B')}}", {"x": "abbbc"})
            == "aBc"
        )


class TestCollator:
    def test_sort_group_restore(self):
        reqs = [("ccc", {"k": 1}), ("a", {"k": 1}), ("bb", {"k": 2}), ("dddd", {"k": 2})]
        collator = utils.Collator(
            reqs,
            sort_fn=lambda x: -len(x[0]),
            group_fn=lambda x: tuple(sorted(x[1].items())),
            group_by="gen_kwargs",
        )
        batches = list(collator.get_batched(n=2))
        # Within each gen-kwargs group, longest first.
        flat = [x[0] for b in batches for x in b]
        assert set(flat) == {"a", "bb", "ccc", "dddd"}
        processed = [x[0].upper() for b in batches for x in b]
        restored = collator.get_original(processed)
        assert restored == ["CCC", "A", "BB", "DDDD"]

    def test_pad_to_bucket(self):
        assert utils.pad_to_bucket(1) == 128
        assert utils.pad_to_bucket(129) == 192  # 64-granular below 512
        assert utils.pad_to_bucket(281) == 288  # 32-granular in 256-384
        assert utils.pad_to_bucket(10**9) == utils.DEFAULT_LENGTH_BUCKETS[-1]


class TestHashing:
    def test_hash_string_stable(self):
        assert utils.hash_string("abc") == utils.hash_string("abc")
        assert len(utils.hash_string("abc")) == 64


class TestSamplers:
    def test_context_sampler_formatting(self, toy_dataset, toy_task_path):
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        tm = TaskManager(include_path=toy_task_path, model_name="fake")
        task = get_tasks_as_dict(["toy"], tm)["toy"]
        from lmms_owc_tpu.samplers import ContextSampler

        sampler = ContextSampler(
            list(task.fewshot_docs()), task, rnd=random.Random(1234)
        )
        ctx = sampler.get_context(task.dataset["test"][0], 2)
        assert ctx.count("What type of object is in this photo?") == 2
        assert ctx.endswith("\n\n")
