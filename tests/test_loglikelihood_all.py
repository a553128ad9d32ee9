"""Every adapter family supports loglikelihood (capability superset).

The reference implements loglikelihood only for the llava families
(src/models/_llava_hf.py:169-260, src/models/_llava_onevision.py:219-345) and
raises NotImplementedError elsewhere; here all adapters share the contract.
"""

import numpy as np
import pytest

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


@pytest.mark.parametrize("model_id", TINY_IDS)
def test_loglikelihood_contract(model_id, toy_task_path, toy_dataset):
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
    from lmms_owc_tpu.tasks._base import TaskInstance

    model = get_model(model_id, batch_size=2, random_init=True, dtype="float32")
    tm = TaskManager(include_path=toy_task_path, model_name=model_id)
    task = get_tasks_as_dict(["toy"], tm)["toy"]
    model.task_dict["toy"] = task

    reqs = [
        TaskInstance(
            request_type="loglikelihood",
            arguments=("What is this?", task.doc_to_target, task.doc_to_visual, i, "toy", "test"),
            idx=0,
            metadata={"task": "toy", "doc_id": i, "repeats": 1},
        )
        for i in range(2)
    ]
    out = model.loglikelihood(reqs)
    assert len(out) == 2
    for loss, is_greedy in out:
        assert np.isfinite(loss) and loss > 0
        assert isinstance(is_greedy, bool)


@pytest.mark.parametrize("model_id", TINY_IDS)
def test_model_init_8bit_smoke(model_id):
    """Mirror of the reference's init matrix (models_test.py:60-73): every family
    constructs with load_in_8bit and carries quantized linear weights."""
    import jax

    from lmms_owc_tpu.models import get_model

    model = get_model(model_id, batch_size=2, random_init=True, dtype="float32",
                      load_in_8bit=True)
    assert model._int8_applied
    leaves = jax.tree_util.tree_leaves_with_path(model.params)
    q8 = [p for p, _ in leaves if "w_q8" in jax.tree_util.keystr(p)]
    assert q8, f"{model_id}: no quantized weights found"


@pytest.mark.parametrize("model_id", TINY_IDS)
def test_text_only_generate(model_id, toy_task_path, toy_dataset):
    """Requests whose doc_to_visual returns [] must work (text-only prompts)."""
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
    from lmms_owc_tpu.tasks._base import TaskInstance

    model = get_model(model_id, batch_size=2, random_init=True, dtype="float32")
    tm = TaskManager(include_path=toy_task_path, model_name=model_id)
    task = get_tasks_as_dict(["toy"], tm)["toy"]
    model.task_dict["toy"] = task

    gen_kwargs = {"max_new_tokens": 4, "do_sample": False, "until": None}
    reqs = [
        TaskInstance(
            request_type="generate_until",
            arguments=("Describe the weather.", gen_kwargs, lambda doc: [], i, "toy", "test"),
            idx=0,
            metadata={"task": "toy", "doc_id": i, "repeats": 1},
        )
        for i in range(2)
    ]
    out = model.generate_until(reqs)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)


@pytest.mark.parametrize("model_id", ["qwen2-vl-tiny", "internvl2-tiny", "idefics2-tiny", "phi3v-tiny"])
def test_mixed_image_counts_in_one_batch(model_id, toy_task_path, toy_dataset):
    """One macro batch mixing 0-, 1-, and 2-image requests (span bookkeeping)."""
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
    from lmms_owc_tpu.tasks._base import TaskInstance

    model = get_model(model_id, batch_size=3, random_init=True, dtype="float32")
    tm = TaskManager(include_path=toy_task_path, model_name=model_id)
    task = get_tasks_as_dict(["toy"], tm)["toy"]
    model.task_dict["toy"] = task

    def visuals_n(n):
        def fn(doc):
            img = task.doc_to_visual(doc)[0]
            return [img] * n
        return fn

    gen_kwargs = {"max_new_tokens": 4, "do_sample": False, "until": None}
    reqs = [
        TaskInstance(
            request_type="generate_until",
            arguments=(f"Prompt {i}.", gen_kwargs, visuals_n(n), i, "toy", "test"),
            idx=0,
            metadata={"task": "toy", "doc_id": i, "repeats": 1},
        )
        for i, n in enumerate([2, 0, 1])
    ]
    out = model.generate_until(reqs)
    assert len(out) == 3
    assert all(isinstance(t, str) for t in out)
