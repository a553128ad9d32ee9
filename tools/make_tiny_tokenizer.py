"""Generate the vendored tiny real-BPE tokenizer fixture.

Produces ``tests/fixtures/tokenizer/tokenizer.json``: a byte-level BPE tokenizer
(real merge semantics — ``" word"`` and ``"word"`` tokenize differently) trained on
a fixed corpus, with the Qwen2-VL chat special tokens registered as added tokens.
Run once; the output is committed so tests can pin exact token ids.

The fixture exists so the test suite exercises prompt assembly and loglikelihood
continuation tokenization through a REAL ``transformers`` tokenizer instead of the
whitespace fallback (the reference's quality bar runs everything through real HF
checkpoints: /root/reference/tests/models/models_test.py:95-143).
"""

from __future__ import annotations

from pathlib import Path

from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

SPECIAL_TOKENS = [
    "<|endoftext|>",
    "<|im_start|>",
    "<|im_end|>",
    "<|vision_start|>",
    "<|vision_end|>",
    "<|image_pad|>",
]

CORPUS = [
    "What type of object is in this photo?",
    "The object in the photo is a dog.",
    "a photo of a cat sitting on a mat",
    "blue red green yellow paris london cheese aircraft flower",
    "system You are a helpful assistant. user assistant",
    "Think step by step and answer the question.",
    "This looks like a golden retriever in the wild.",
    "caltech dtd eurosat aircraft flowers food pets cars sun ucf",
]


def main() -> None:
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=SPECIAL_TOKENS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "tokenizer"
    out.mkdir(parents=True, exist_ok=True)
    tok.save(str(out / "tokenizer.json"))
    print(f"wrote {out / 'tokenizer.json'} (vocab={tok.get_vocab_size()})")


if __name__ == "__main__":
    main()
