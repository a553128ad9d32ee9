"""Disk-path parity for the scoring-model weight converters.

The scoring stack (SBERT sentence encoder, Llama judge, CLIP scorer) backs the
reference's headline metrics (reference src/data/pipelines/text/_text.py:143-332,
src/data/pipelines/image/_image.py). These tests exercise the FULL ``from_pretrained``
path — tiny random torch checkpoints saved HF-format to disk (config.json +
model.safetensors + real tokenizer files), loaded through the repo's converters, and
pinned against the torch reference computation — so a transposed kernel, a wrong
pooling, or a tokenizer-loading regression cannot ship silently.
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


# ----------------------------------------------------------------- SBERT


@pytest.fixture(scope="module")
def bert_checkpoint(tmp_path_factory) -> Path:
    """Tiny random HF BERT checkpoint dir with a real WordPiece tokenizer."""
    from transformers import BertConfig, BertModel, BertTokenizer

    path = tmp_path_factory.mktemp("tiny_bert")
    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "fast", "bird", "flew"]
        + ["##s", "##ing", "blue", "red", "sky", "grass", "over", "jumped", "lazy", "quick"]
    )
    vocab_file = path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    tokenizer = BertTokenizer(str(vocab_file))
    tokenizer.save_pretrained(str(path))

    torch.manual_seed(0)
    config = BertConfig(
        vocab_size=len(vocab),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
    )
    model = BertModel(config).eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return path


class TestSbertFromPretrained:
    def test_embeddings_match_torch_meanpool(self, bert_checkpoint):
        """SentenceEncoder.from_pretrained == torch BERT + mean-pool + L2 (ref _text.py:176-189)."""
        from transformers import AutoTokenizer, BertModel

        from lmms_owc_tpu.nn.sbert import SentenceEncoder

        sentences = [
            "the cat sat on a mat",
            "a quick dog jumped over the lazy dog",
            "red sky",
            "birds flew fast over blue grass",
        ]

        encoder = SentenceEncoder.from_pretrained(str(bert_checkpoint))
        assert encoder.config.hidden_size == 32 and encoder.config.num_layers == 2
        ours = encoder.encode(sentences)

        model = BertModel.from_pretrained(str(bert_checkpoint)).eval()
        tok = AutoTokenizer.from_pretrained(str(bert_checkpoint))
        enc = tok(sentences, padding=True, truncation=True, return_tensors="pt")
        with torch.no_grad():
            hidden = model(**enc).last_hidden_state
        mask = enc["attention_mask"].unsqueeze(-1).float()
        pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        expected = torch.nn.functional.normalize(pooled, p=2, dim=1).numpy()

        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)
        # Embeddings are L2-normalized and non-degenerate.
        np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=1e-5)

    def test_batch_padding_invariance(self, bert_checkpoint):
        """Bucketed/padded encode must equal the per-sentence encode."""
        from lmms_owc_tpu.nn.sbert import SentenceEncoder

        encoder = SentenceEncoder.from_pretrained(str(bert_checkpoint))
        sentences = ["the cat sat", "a quick dog jumped over the lazy dog ran fast"]
        batched = encoder.encode(sentences)
        singles = np.concatenate([encoder.encode([s]) for s in sentences])
        np.testing.assert_allclose(batched, singles, rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------------- Judge (Llama)

JUDGE_CHAT_TEMPLATE = (
    "{% for message in messages %}<|{{ message['role'] }}|>\n"
    "{{ message['content'] }}\n<|eot_id|>\n{% endfor %}"
    "{% if add_generation_prompt %}<|assistant|>\n{% endif %}"
)


@pytest.fixture(scope="module")
def llama_checkpoint(tmp_path_factory) -> Path:
    """Tiny random HF Llama checkpoint + word-level fast tokenizer with chat template."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("tiny_llama")
    words = [
        "<unk>", "<s>", "</s>", "<|eot_id|>", "<|user|>", "<|assistant|>",
        "yes", "no", "correct", "incorrect", "answer:", "prediction:", "reference:",
        "is", "the", "a", "b", "judge", "better", "worse", "tie", "score",
    ] + [f"w{i}" for i in range(40)]
    tok = Tokenizer(WordLevel({w: i for i, w in enumerate(words)}, unk_token="<unk>"))
    tok.pre_tokenizer = WhitespaceSplit()
    tokenizer = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
        pad_token="<unk>",
    )
    tokenizer.chat_template = JUDGE_CHAT_TEMPLATE
    tokenizer.save_pretrained(str(path))

    torch.manual_seed(1)
    config = LlamaConfig(
        vocab_size=len(words),
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    model = LlamaForCausalLM(config).eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return path


class TestJudgeFromPretrained:
    def test_verdicts_match_torch_greedy(self, llama_checkpoint):
        """JudgeModel.from_pretrained greedy output == torch generate (ref _text.py:211-332)."""
        from transformers import AutoTokenizer, LlamaForCausalLM

        from lmms_owc_tpu.nn.judge import MAX_NEW_TOKENS, JudgeModel

        prompts = [
            "is the prediction: w3 w7 correct answer: w3 w7",
            "judge a better b worse reference: w12 w1 w9 w22 w30 score",
            "yes no tie",
        ]

        judge = JudgeModel.from_pretrained(str(llama_checkpoint), dtype=jnp.float32)
        ours = judge.score_pairs(prompts, None, None)
        assert len(ours) == len(prompts)

        model = LlamaForCausalLM.from_pretrained(str(llama_checkpoint)).eval().float()
        tok = AutoTokenizer.from_pretrained(str(llama_checkpoint))
        eot_id = tok.convert_tokens_to_ids("<|eot_id|>")
        eos_ids = {tok.eos_token_id, eot_id, model.config.pad_token_id}
        expected = []
        for prompt in prompts:
            text = tok.apply_chat_template(
                [{"role": "user", "content": prompt}], tokenize=False, add_generation_prompt=True
            )
            ids = tok.encode(text, add_special_tokens=False)
            with torch.no_grad():
                # Explicit all-ones mask: generate() would otherwise infer the mask
                # from input_ids != pad_token_id and mask real <unk> prompt tokens.
                out = model.generate(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                    max_new_tokens=MAX_NEW_TOKENS,
                    do_sample=False,
                    eos_token_id=None,
                    pad_token_id=0,
                )[0, len(ids):].tolist()
            keep = []
            for t in out:
                if t in eos_ids:
                    break
                keep.append(t)
            expected.append(tok.decode(keep, skip_special_tokens=True).strip())

        assert ours == expected

    def test_data_parallel_matches_single_device(self, llama_checkpoint):
        """Mesh-sharded judging (8 virtual devices, row-padded batches) must be
        verdict-identical to single-device judging (ref eval_ranking.py:173-190
        shards the judge per CUDA device; here it is one pjit over a data mesh)."""
        import jax

        from lmms_owc_tpu.nn.judge import JudgeModel

        prompts = [f"judge w{i} better a b tie score" for i in range(11)]  # 11 % 8 != 0
        dp = JudgeModel.from_pretrained(str(llama_checkpoint), dtype=jnp.float32)
        sd = JudgeModel.from_pretrained(
            str(llama_checkpoint), dtype=jnp.float32, data_parallel=False
        )
        assert (dp.mesh is not None) == (jax.local_device_count() > 1)
        assert sd.mesh is None
        assert dp.score_pairs(prompts, None, None) == sd.score_pairs(prompts, None, None)

    def test_qkv_merge_matches_unmerged(self, llama_checkpoint, monkeypatch):
        """Judge verdicts with the load-time qkv merge forced must be identical
        to the unmerged tree (the judge is decode-dominated, so this pins
        decode_step's merged one-matmul branch on the Llama/no-bias tree)."""
        from lmms_owc_tpu.nn.judge import JudgeModel

        prompts = [f"judge w{i} better a b tie score" for i in range(5)]
        base = JudgeModel.from_pretrained(
            str(llama_checkpoint), dtype=jnp.float32, data_parallel=False
        )
        monkeypatch.setenv("LMMS_OWC_DECODER_QKV_MERGE", "force")
        merged = JudgeModel.from_pretrained(
            str(llama_checkpoint), dtype=jnp.float32, data_parallel=False
        )
        assert "qkv" in merged.params["layers"]["attn"]
        assert base.score_pairs(prompts, None, None) == merged.score_pairs(prompts, None, None)

    def test_load_in_8bit_runs_and_quantizes(self, llama_checkpoint):
        """load_in_8bit streams the judge tree to the device with int8 linear
        leaves (the serving mode for real checkpoints: decode is weight-HBM-
        bound, int8 halves the per-step read). int8 changes numerics, so this
        pins the tree shape + a non-degenerate verdict, not exact strings."""
        import jax

        from lmms_owc_tpu.nn.judge import JudgeModel

        judge = JudgeModel.from_pretrained(
            str(llama_checkpoint), load_in_8bit=True, data_parallel=False
        )
        attn = judge.params["layers"]["attn"]
        leaf = (attn.get("qkv") or attn["q"])["w_q8"]
        assert leaf["q"].dtype == jax.numpy.int8
        out = judge.score_pairs(["is w3 contained in w3 w7? yes or no"], None, None)
        assert len(out) == 1 and isinstance(out[0], str)

    def test_random_init_8bit_on_device(self, monkeypatch):
        """random_init(load_in_8bit=True) must build the tree via on-device
        quantized init (eval_shape spec -> init_quantized_on_device): the bf16
        and int8 trees never coexist. The init-then-quantize form OOM'd a
        16 GB v5e with the real 3B config (round-4 judge A/B)."""
        import lmms_owc_tpu.nn.judge as judge_mod

        tiny = dict(
            vocab_size=512, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            rope_theta=10000.0, rms_norm_eps=1e-5, max_position_embeddings=2048,
            tie_word_embeddings=True, eos_token_id=5, pad_token_id=0,
        )
        monkeypatch.setattr(judge_mod, "LLAMA32_3B_CONFIG", tiny)
        judge = judge_mod.JudgeModel.random_init(
            seed=0, load_in_8bit=True, data_parallel=False
        )
        attn = judge.params["layers"]["attn"]
        leaf = (attn.get("qkv") or attn["q"])["w_q8"]
        assert leaf["q"].dtype == jnp.int8

        # The fallback tokenizer hashes into the real 128k vocab; remap its ids
        # into the tiny test vocab so the embedding lookup stays in range.
        class _TinyTok(judge.tokenizer.__class__):
            eos_token_id = 5
            pad_token_id = 0

            def encode(self, text, add_special_tokens=True):
                return [tok % 512 for tok in super().encode(text, add_special_tokens)]

        judge.tokenizer = _TinyTok()
        out = judge.score_pairs(["is w3 contained in w3 w7? yes or no"], None, None)
        assert len(out) == 1 and isinstance(out[0], str)

    def test_tokenizer_roundtrip_has_eot(self, llama_checkpoint):
        """The saved tokenizer must resolve <|eot_id|> so the judge's stop set is real."""
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(str(llama_checkpoint))
        assert tok.convert_tokens_to_ids("<|eot_id|>") == 3


# ----------------------------------------------------------------- CLIP


@pytest.fixture(scope="module")
def clip_checkpoint(tmp_path_factory) -> Path:
    """Tiny random HF CLIP checkpoint + character-level BPE tokenizer + processor."""
    from transformers import (
        CLIPConfig,
        CLIPImageProcessor,
        CLIPModel,
        CLIPProcessor,
        CLIPTokenizer,
    )

    path = tmp_path_factory.mktemp("tiny_clip")
    letters = list("abcdefghijklmnopqrstuvwxyz")
    tokens = ["<|startoftext|>", "<|endoftext|>"] + letters + [c + "</w>" for c in letters]
    (path / "vocab.json").write_text(json.dumps({t: i for i, t in enumerate(tokens)}))
    (path / "merges.txt").write_text("#version: 0.2\n")
    tokenizer = CLIPTokenizer(str(path / "vocab.json"), str(path / "merges.txt"))
    image_processor = CLIPImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28}
    )
    CLIPProcessor(image_processor=image_processor, tokenizer=tokenizer).save_pretrained(str(path))

    torch.manual_seed(2)
    config = CLIPConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        text_config=dict(
            vocab_size=len(tokens), hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48, max_position_embeddings=32,
            bos_token_id=0, eos_token_id=1,
        ),
        projection_dim=20,
    )
    model = CLIPModel(config).eval()
    model.save_pretrained(str(path), safe_serialization=True)
    return path


class TestClipFromPretrained:
    def test_logits_match_torch(self, clip_checkpoint):
        """ClipScorer.from_pretrained logits_per_image == torch CLIPModel."""
        from PIL import Image
        from transformers import CLIPModel, CLIPProcessor

        from lmms_owc_tpu.nn.clip import ClipScorer

        rng = np.random.RandomState(0)
        images = [
            Image.fromarray(rng.randint(0, 255, size=(40, 40, 3), dtype=np.uint8))
            for _ in range(2)
        ]
        texts = ["cat", "a dog ran"]  # unequal lengths: exercises padded EOS pooling

        scorer = ClipScorer.from_pretrained(str(clip_checkpoint))
        ours = scorer.score(images, texts)

        model = CLIPModel.from_pretrained(str(clip_checkpoint)).eval()
        processor = CLIPProcessor.from_pretrained(str(clip_checkpoint))
        inputs = processor(images=images, text=texts, return_tensors="pt", padding=True)
        with torch.no_grad():
            expected = model(**inputs).logits_per_image.numpy()

        assert ours.shape == expected.shape == (2, 2)
        np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)
