"""Real-tokenizer fixture tests: prompt assembly and loglikelihood delimiter parity.

Adapters otherwise run under fallback whitespace tokenizers, which cannot detect
word-boundary bugs (``" word"`` and ``"word"`` split identically). These tests run
the flagship paths through a REAL byte-level BPE tokenizer (vendored fixture,
``tools/make_tiny_tokenizer.py``) so prompt-assembly drift fails at the token-id
level — the reference's quality bar is pinned values through real HF tokenizers
(/root/reference/tests/models/models_test.py:95-143).

Delimiter contract (reference src/models/_llava_hf.py:181-183): the word-boundary
space lives IN the continuation (the task layer prepends ``target_delimiter``,
tasks/_manager.py construct_requests); adapters must NOT insert another one.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "tokenizer" / "tokenizer.json"

TINY_IDS = [
    "qwen2-vl-tiny",
    "qwen2.5-vl-tiny",
    "internvl2-tiny",
    "instructblip-tiny",
    "idefics2-tiny",
    "phi3v-tiny",
    "llava-tiny",
    "llava-onevision-tiny",
]


@pytest.fixture(scope="module")
def real_tok():
    from transformers import PreTrainedTokenizerFast

    return PreTrainedTokenizerFast(
        tokenizer_file=str(FIXTURE), eos_token="<|im_end|>", pad_token="<|endoftext|>"
    )


def test_fixture_has_real_boundary_semantics(real_tok):
    """BPE merges across the space: ' paris' is one token, '  paris' two, 'paris' three."""
    bare = real_tok.encode("paris", add_special_tokens=False)
    spaced = real_tok.encode(" paris", add_special_tokens=False)
    double = real_tok.encode("  paris", add_special_tokens=False)
    assert spaced != bare
    assert double != spaced
    assert double[-len(spaced) :] == spaced  # double space = extra space token + " paris"


@pytest.mark.parametrize("model_id", TINY_IDS)
def test_adapter_scores_continuation_verbatim(model_id, toy_task_path, toy_dataset):
    """Every adapter feeds the task-supplied continuation (delimiter included)
    unmodified into continuation tokenization — no second delimiter."""
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.models._base import Model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
    from lmms_owc_tpu.tasks._base import TaskInstance

    model = get_model(model_id, batch_size=2, random_init=True, dtype="float32")
    tm = TaskManager(include_path=toy_task_path, model_name=model_id)
    task = get_tasks_as_dict(["toy"], tm)["toy"]
    model.task_dict["toy"] = task

    seen: list[str] = []
    orig = Model._encode_continuation

    def recording(self, continuation):
        seen.append(continuation)
        return orig(self, continuation)

    Model._encode_continuation = recording
    try:
        reqs = [
            TaskInstance(
                request_type="loglikelihood",
                arguments=("What is this?", " paris", task.doc_to_visual, 0, "toy", "test"),
                idx=0,
                metadata={"task": "toy", "doc_id": 0, "repeats": 1},
            )
        ]
        out = model.loglikelihood(reqs)
    finally:
        Model._encode_continuation = orig
    assert len(out) == 1 and np.isfinite(out[0][0])
    assert seen == [" paris"]


def test_flagship_loglikelihood_token_ids_with_real_tokenizer(
    real_tok, toy_task_path, toy_dataset
):
    """Through the real BPE tokenizer, the scored continuation ids are exactly
    ``encode(" paris")`` — a double delimiter would prepend the space token."""
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.models._base import Model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
    from lmms_owc_tpu.tasks._base import TaskInstance

    model = get_model("qwen2-vl-tiny", batch_size=2, random_init=True, dtype="float32")
    model.tokenizer = real_tok
    tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
    task = get_tasks_as_dict(["toy"], tm)["toy"]
    model.task_dict["toy"] = task

    recorded: list[list[int]] = []
    orig = Model._encode_continuation

    def recording(self, continuation):
        ids = orig(self, continuation)
        recorded.append(ids)
        return ids

    Model._encode_continuation = recording
    try:
        reqs = [
            TaskInstance(
                request_type="loglikelihood",
                arguments=("What is this?", " paris", None, 0, "toy", "test"),
                idx=0,
                metadata={"task": "toy", "doc_id": 0, "repeats": 1},
            )
        ]
        model.loglikelihood(reqs)
    finally:
        Model._encode_continuation = orig

    expected = real_tok.encode(" paris", add_special_tokens=False)
    space = real_tok.encode("  paris", add_special_tokens=False)[0]
    assert recorded == [expected]
    assert recorded[0][0] != space  # the old prompt+" "+cont join produced this


def test_flagship_prompt_ids_pinned(real_tok):
    """Pin the flagship's assembled chat prompt at the token-id level: any drift in
    prompt assembly (system header, role markers, generation prompt) fails here."""
    from lmms_owc_tpu.models import get_model

    model = get_model("qwen2-vl-tiny", batch_size=1, random_init=True, dtype="float32")
    model.tokenizer = real_tok
    prompt = model._build_prompt("What type of object is in this photo?", 0)
    ids = model._tokenize_with_images(prompt, [])
    # Golden ids for the vendored fixture (tests/fixtures/tokenizer/tokenizer.json).
    assert ids == [
        1, 414, 204, 323, 90, 377, 262, 416, 320, 19, 2, 204,
        1, 90, 357, 204, 408, 385, 310, 319, 301, 280, 384, 284, 36, 2, 204,
        1, 70, 295, 308, 89, 204,
    ]
    assert real_tok.decode(ids) == prompt


def test_flagship_generate_roundtrip_with_real_tokenizer(real_tok, toy_task_path, toy_dataset):
    """generate_until end-to-end through the real tokenizer: the model consumes the
    pinned prompt ids and the decode path detokenizes through the fixture."""
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
    from lmms_owc_tpu.tasks._base import TaskInstance

    model = get_model("qwen2-vl-tiny", batch_size=1, random_init=True, dtype="float32")
    model.tokenizer = real_tok
    tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
    task = get_tasks_as_dict(["toy"], tm)["toy"]
    model.task_dict["toy"] = task

    req = TaskInstance(
        request_type="generate_until",
        arguments=(
            "What type of object is in this photo?",
            {"max_new_tokens": 4, "do_sample": False, "until": None},
            None,
            0,
            "toy",
            "test",
        ),
        idx=0,
        metadata={"task": "toy", "doc_id": 0, "repeats": 1},
    )
    out = model.generate_until([req])
    assert len(out) == 1 and isinstance(out[0], str)
