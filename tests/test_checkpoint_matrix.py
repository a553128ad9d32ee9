"""Tiny-checkpoint load-path matrix: every family's ``pretrained=`` path from disk.

Each family gets a miniature HF-format checkpoint directory (config.json +
model.safetensors from the family's torch class + a real BPE tokenizer with the
family's special tokens pinned to config ids) and is driven end-to-end through
``get_model(..., pretrained=dir)`` → ``generate_until`` with an image — in bf16
and through the ``load_in_8bit`` host-stream quantized path. This closes the gap
between the in-memory converter parity suites and what production does: load from
disk (reference loads every family via ``from_pretrained(path)``, e.g.
src/models/_qwen2_vl.py:89-121).
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

FIXTURE_TOK = Path(__file__).parent / "fixtures" / "tokenizer" / "tokenizer.json"


def _write_tokenizer(path: Path, extra_specials: dict[str, int] | None = None,
                     eos: str = "<|im_end|>", pad: str = "<|endoftext|>") -> None:
    """Write the vendored BPE fixture + family special tokens at PINNED ids."""
    from transformers import PreTrainedTokenizerFast

    blob = json.loads(FIXTURE_TOK.read_text())
    existing = {a["content"] for a in blob["added_tokens"]}
    extras = {c: i for c, i in (extra_specials or {}).items() if c not in existing}
    if extras:
        # The tokenizers loader assigns added-token ids contiguously after the
        # vocab — a pinned high id only sticks if every id below it exists (real
        # checkpoints' BPE vocabs are dense). Pad with filler entries.
        vocab = blob["model"]["vocab"]
        taken = set(vocab.values()) | {a["id"] for a in blob["added_tokens"]} | set(extras.values())
        lo, hi = min(extras.values()), max(extras.values())
        assert lo not in taken - set(extras.values()), "special id collides with BPE vocab"
        # Dense vocab below the special block; ADDED fillers inside it, so the
        # added-token block sits contiguous at the top (the layout tokenizers
        # preserves pinned ids for — real checkpoints look exactly like this).
        to_add = dict(extras)
        for idx in range(hi):
            if idx in taken:
                continue
            if idx < lo:
                vocab[f"�filler{idx}�"] = idx
            else:
                to_add[f"�addfill{idx}�"] = idx
        for content, idx in sorted(to_add.items(), key=lambda kv: kv[1]):
            blob["added_tokens"].append({
                "id": idx, "content": content, "single_word": False, "lstrip": False,
                "rstrip": False, "normalized": False, "special": True,
            })
    tok_file = path / "tokenizer.json"
    tok_file.write_text(json.dumps(blob))
    tokenizer = PreTrainedTokenizerFast(
        tokenizer_file=str(tok_file), eos_token=eos, pad_token=pad
    )
    # Round-trip check: pinned ids survived.
    for content, idx in (extra_specials or {}).items():
        assert tokenizer.convert_tokens_to_ids(content) == idx, content
    tokenizer.save_pretrained(str(path))


# --------------------------------------------------------------- builders
# Specials in the vendored fixture: <|endoftext|>=0 <|im_start|>=1 <|im_end|>=2
# <|vision_start|>=3 <|vision_end|>=4 <|image_pad|>=5. Extra family tokens pin
# ids >= 500 (above the 434-token BPE vocab).

_TEXT_TINY = dict(
    vocab_size=512, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
    rope_theta=10000.0, tie_word_embeddings=False,
)


def _build_qwen2_vl(path: Path) -> None:
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    config = Qwen2VLConfig(
        text_config=dict(_TEXT_TINY, rms_norm_eps=1e-6,
                         rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0,
                           in_channels=3, patch_size=14, temporal_patch_size=2,
                           spatial_merge_size=2, hidden_size=64),
        image_token_id=5, video_token_id=500, vision_start_token_id=3,
        eos_token_id=2, pad_token_id=0,
    )
    Qwen2VLForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(path, {"<|video_pad|>": 500})


def _build_qwen2_5_vl(path: Path) -> None:
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    config = Qwen2_5_VLConfig(
        text_config=dict(_TEXT_TINY, rms_norm_eps=1e-6,
                         rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
                           out_hidden_size=64, patch_size=14, temporal_patch_size=2,
                           spatial_merge_size=2, window_size=56, fullatt_block_indexes=[1]),
        image_token_id=5, video_token_id=500, vision_start_token_id=3,
        eos_token_id=2, pad_token_id=0,
    )
    Qwen2_5_VLForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(path, {"<|video_pad|>": 500})


def _build_llava(path: Path) -> None:
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(0)
    config = LlavaConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, image_size=28, patch_size=14),
        text_config=dict(_TEXT_TINY, model_type="llama", rms_norm_eps=1e-5),
        image_token_index=500,
        pad_token_id=0,
        eos_token_id=2,
    )
    LlavaForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(path, {"<image>": 500})


def _build_llava_onevision(path: Path) -> None:
    from transformers import LlavaOnevisionConfig, LlavaOnevisionForConditionalGeneration

    torch.manual_seed(0)
    config = LlavaOnevisionConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, image_size=56, patch_size=14),
        text_config=dict(_TEXT_TINY, model_type="qwen2", rms_norm_eps=1e-6),
        image_token_index=500,
        image_grid_pinpoints=[[56, 56], [56, 112], [112, 56], [112, 112]],
        vision_aspect_ratio="anyres_max_4",
    )
    LlavaOnevisionForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(path, {"<image>": 500})


def _build_internvl2(path: Path) -> None:
    from transformers import InternVLConfig
    from transformers.models.internvl.modeling_internvl import InternVLForConditionalGeneration

    torch.manual_seed(0)
    config = InternVLConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, image_size=[28, 28], patch_size=[14, 14],
                           use_qk_norm=False, layer_norm_eps=1e-6),
        text_config=dict(_TEXT_TINY, model_type="qwen2", rms_norm_eps=1e-6),
        image_token_id=500,
        downsample_ratio=0.5,
    )
    InternVLForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(path, {"<IMG_CONTEXT>": 500, "<img>": 501, "</img>": 502})


def _build_instructblip(path: Path) -> None:
    from transformers import InstructBlipConfig, InstructBlipForConditionalGeneration

    torch.manual_seed(0)
    config = InstructBlipConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, image_size=28, patch_size=14),
        qformer_config=dict(hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=48, encoder_hidden_size=32,
                            cross_attention_frequency=1, vocab_size=64),
        text_config=dict(_TEXT_TINY, model_type="llama", rms_norm_eps=1e-5),
        num_query_tokens=4,
    )
    InstructBlipForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(path)
    # Q-Former wordpiece tokenizer lives in a subdirectory of released checkpoints.
    from transformers import BertTokenizer

    qdir = path / "qformer_tokenizer"
    qdir.mkdir(exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"tok{i}" for i in range(59)]
    (qdir / "vocab.txt").write_text("\n".join(vocab) + "\n")
    BertTokenizer(str(qdir / "vocab.txt")).save_pretrained(str(qdir))


def _build_idefics2(path: Path) -> None:
    from transformers import Idefics2Config, Idefics2ForConditionalGeneration

    torch.manual_seed(0)
    config = Idefics2Config(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, image_size=28, patch_size=14),
        perceiver_config=dict(resampler_n_latents=4, resampler_depth=1, resampler_n_heads=4,
                              resampler_head_dim=8, num_key_value_heads=2,
                              hidden_size=64, rms_norm_eps=1e-5),
        text_config=dict(_TEXT_TINY, model_type="mistral", rms_norm_eps=1e-5),
        image_token_id=500,
    )
    Idefics2ForConditionalGeneration(config).eval().save_pretrained(str(path))
    _write_tokenizer(
        path, {"<image>": 500, "<fake_token_around_image>": 501, "<end_of_utterance>": 502}
    )


def _build_phi3v(path: Path) -> None:
    """Synthesized Phi-3-vision layout: fused-qkv Phi3 decoder + embedded CLIP tower
    (the released checkpoints are remote-code; no HF class emits this format)."""
    from safetensors.torch import save_file
    from transformers import CLIPVisionConfig, CLIPVisionModel, Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    text_config = Phi3Config(
        vocab_size=32064, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=512,
        original_max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, pad_token_id=32000, eos_token_id=32007,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.1 * i for i in range(8)],
                      "long_factor": [2.0] * 8},
    )
    decoder = Phi3ForCausalLM(text_config).eval()
    vision = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=336, patch_size=14,
    )).eval()

    state = {k: v.clone() for k, v in decoder.state_dict().items()}
    for k, v in vision.state_dict().items():
        state[f"model.vision_embed_tokens.img_processor.{k}"] = v.clone()
    h, merge_dim = 64, 32 * 4
    g = torch.Generator().manual_seed(1)
    state["model.vision_embed_tokens.img_projection.0.weight"] = torch.randn(h, merge_dim, generator=g) * 0.02
    state["model.vision_embed_tokens.img_projection.0.bias"] = torch.zeros(h)
    state["model.vision_embed_tokens.img_projection.2.weight"] = torch.randn(h, h, generator=g) * 0.02
    state["model.vision_embed_tokens.img_projection.2.bias"] = torch.zeros(h)
    state["model.vision_embed_tokens.sub_GN"] = torch.randn(1, 1, 1, merge_dim, generator=g) * 0.02
    state["model.vision_embed_tokens.glb_GN"] = torch.randn(1, 1, merge_dim, generator=g) * 0.02
    save_file({k: v.contiguous() for k, v in state.items()}, str(path / "model.safetensors"))

    cfg = text_config.to_dict()
    cfg["vision_config"] = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                                intermediate_size=64, image_size=336, patch_size=14)
    (path / "config.json").write_text(json.dumps(cfg))
    _write_tokenizer(
        path,
        {"<|image_1|>": 32044, "<|image_2|>": 32045, "<|end|>": 32007,
         "<|user|>": 32010, "<|assistant|>": 32001},
        eos="<|end|>",
    )


FAMILIES = {
    "qwen2-vl-tiny": _build_qwen2_vl,
    "qwen2.5-vl-tiny": _build_qwen2_5_vl,
    "llava-tiny": _build_llava,
    "llava-onevision-tiny": _build_llava_onevision,
    "internvl2-tiny": _build_internvl2,
    "instructblip-tiny": _build_instructblip,
    "idefics2-tiny": _build_idefics2,
    "phi3v-tiny": _build_phi3v,
}

_DIRS: dict[str, Path] = {}


@pytest.fixture
def checkpoint_dir(request, tmp_path_factory):
    family = request.param
    if family not in _DIRS:
        path = tmp_path_factory.mktemp(f"ckpt_{family.replace('.', '_')}")
        FAMILIES[family](path)
        _DIRS[family] = path
    return family, _DIRS[family]


def _drive(model) -> list[str]:
    from PIL import Image

    from lmms_owc_tpu.tasks._base import TaskInstance

    rng = np.random.RandomState(0)

    def one_image(_doc):
        return [Image.fromarray(rng.randint(0, 255, size=(48, 56, 3), dtype=np.uint8))]

    reqs = [
        TaskInstance(
            request_type="generate_until",
            arguments=(f"Describe image {i}.", {"max_new_tokens": 4}, one_image, i, "toy", "test"),
            idx=0,
            metadata={"task": "toy", "doc_id": i, "repeats": 1},
        )
        for i in range(2)
    ]
    return model.generate_until(reqs)


@pytest.mark.parametrize("checkpoint_dir", sorted(FAMILIES), indirect=True)
def test_from_pretrained_generate(checkpoint_dir):
    from lmms_owc_tpu.models import get_model

    family, path = checkpoint_dir
    model = get_model(family, pretrained=str(path), batch_size=2, dtype="float32")
    out = _drive(model)
    assert len(out) == 2 and all(isinstance(o, str) for o in out)


@pytest.mark.parametrize("checkpoint_dir", sorted(FAMILIES), indirect=True)
def test_from_pretrained_int8_host_stream(checkpoint_dir):
    """load_in_8bit: checkpoint quantizes host-side and still generates."""
    from lmms_owc_tpu.models import get_model

    family, path = checkpoint_dir
    model = get_model(family, pretrained=str(path), batch_size=2, dtype="float32",
                      load_in_8bit=True)
    out = _drive(model)
    assert len(out) == 2 and all(isinstance(o, str) for o in out)


@pytest.mark.parametrize("checkpoint_dir", sorted(FAMILIES), indirect=True)
def test_from_pretrained_qkv_merge_matches(checkpoint_dir, monkeypatch):
    """Every family's decoder rides the shared prefill/decode_step, so the
    load-time qkv merge (Model.__init__ hook) must be output-identical to the
    split tree through the real generate_until path."""
    import jax

    from lmms_owc_tpu.models import get_model

    family, path = checkpoint_dir
    monkeypatch.delenv("LMMS_OWC_DECODER_QKV_MERGE", raising=False)
    jax.clear_caches()
    base = _drive(get_model(family, pretrained=str(path), batch_size=2, dtype="float32"))
    monkeypatch.setenv("LMMS_OWC_DECODER_QKV_MERGE", "force")
    jax.clear_caches()
    model = get_model(family, pretrained=str(path), batch_size=2, dtype="float32")
    text_tree = model.params["text"] if "text" in model.params else model.params
    assert "qkv" in text_tree["layers"]["attn"]
    assert _drive(model) == base


@pytest.mark.parametrize(
    "checkpoint_dir", ["qwen2-vl-tiny", "llava-tiny", "phi3v-tiny"], indirect=True
)
def test_from_pretrained_kv_int8_matches(checkpoint_dir, monkeypatch):
    """int8 KV cache (LMMS_OWC_KV_INT8) through the real generate_until path:
    identical outputs on representative families (GQA qwen, MHA llava/vicuna,
    no-bias phi3)."""
    import jax

    from lmms_owc_tpu.models import get_model

    family, path = checkpoint_dir
    monkeypatch.delenv("LMMS_OWC_KV_INT8", raising=False)
    jax.clear_caches()
    base = _drive(get_model(family, pretrained=str(path), batch_size=2, dtype="float32"))
    monkeypatch.setenv("LMMS_OWC_KV_INT8", "force")
    jax.clear_caches()
    out = _drive(get_model(family, pretrained=str(path), batch_size=2, dtype="float32"))
    assert out == base


@pytest.mark.parametrize("checkpoint_dir", ["qwen2-vl-tiny"], indirect=True)
def test_from_pretrained_all_probes_combined(checkpoint_dir, monkeypatch):
    """All three opt-in serving probes enabled TOGETHER (qkv merge + int8 KV
    cache + feature-major vision): winners of the hardware A/Bs may ship as a
    combination, and each probe rewrites a different part of the same forward
    pass (weight tree, decode carry, vision layout) — the composition is what
    production would run, so pin it to the all-off outputs."""
    import jax

    from lmms_owc_tpu.models import get_model

    family, path = checkpoint_dir
    for var in ("LMMS_OWC_DECODER_QKV_MERGE", "LMMS_OWC_KV_INT8", "LMMS_OWC_VISION_FM"):
        monkeypatch.delenv(var, raising=False)
    jax.clear_caches()
    base = _drive(get_model(family, pretrained=str(path), batch_size=2, dtype="float32"))
    for var in ("LMMS_OWC_DECODER_QKV_MERGE", "LMMS_OWC_KV_INT8", "LMMS_OWC_VISION_FM"):
        monkeypatch.setenv(var, "force")
    jax.clear_caches()
    out = _drive(get_model(family, pretrained=str(path), batch_size=2, dtype="float32"))
    assert out == base
