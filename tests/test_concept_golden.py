"""Golden-lock the concept-extraction POST-PROCESSING against the reference.

spaCy itself is absent from this environment, so ``en_core_web_lg`` can't run
anywhere here — but everything AFTER the NLP call is pure Python in both repos:
lowercasing, article/possessive prefix strip, skip-word filtering, the
chunks-append-only-under-remove_prefix quirk, ent dedup-against-chunks, the
"prediction itself as extra concept" append, (ref, concept) pair dedup, and the
max/mean/median/min/none reduce modes of ``concept_semantic_similarity``
(reference src/data/pipelines/text/_text.py:18-140 and
src/data/metrics/_group.py:176-334).

These tests inject ONE deterministic stub NLP (fixed noun_chunks/ents derived
from each input string) into the reference's own ``concept_extraction_spacy``
and into our ``_concepts_spacy``, plus one deterministic stub sentence encoder
into both aggregation paths, and assert identical concept lists and identical
reduce outputs on a shared corpus. After this, the only untested link in the
concept metric is spaCy itself (VERDICT r3 item 5).
"""

import importlib
import logging
import sys
import types
import zoneinfo
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


# --------------------------------------------------------------------------------------
# Stub NLP shared by both sides
# --------------------------------------------------------------------------------------


class _Span:
    def __init__(self, text):
        self.text = text


class _StubDoc:
    """Deterministic doc: chunks/ents derived purely from the input string."""

    def __init__(self, text):
        words = text.split()
        # noun_chunks: word bigrams at even offsets, plus the first word alone.
        self.noun_chunks = [
            _Span(" ".join(words[i : i + 2])) for i in range(0, len(words) - 1, 2)
        ]
        if words:
            self.noun_chunks.append(_Span(words[0]))
        # ents: words longer than 4 chars, plus the full text when it has a digit.
        self.ents = [_Span(w) for w in words if len(w) > 4]
        if any(c.isdigit() for c in text):
            self.ents.append(_Span(text))


class _StubNLP:
    def pipe(self, texts, batch_size=None):
        for text in texts:
            yield _StubDoc(text)

    def __call__(self, text):
        return _StubDoc(text)


class _StubEncoder:
    """Deterministic embedding: md5-seeded 16-dim unit vector per string."""

    @staticmethod
    def embed(text: str) -> np.ndarray:
        import hashlib

        seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:4], "little")
        vec = np.random.RandomState(seed).standard_normal(16).astype(np.float32)
        return vec / np.linalg.norm(vec)

    # our-side protocol (lmms_owc_tpu.pipelines.text._get_sentence_encoder)
    def encode(self, sentences, batch_size=1024):
        return np.stack([self.embed(s) for s in sentences]) if sentences else np.zeros((0, 16), np.float32)


def _ref_encode_sentence_bert_stub(batch, rank=None, **kwargs):
    """Reference-side protocol: datasets.map batch dict, appends embeds column."""
    input_column = kwargs.pop("input_column", "text")
    output_column = kwargs.pop("output_column", f"{input_column}_sentence_bert_embeds")
    batch[output_column] = [_StubEncoder.embed(t).tolist() for t in batch[input_column]]
    return batch


# --------------------------------------------------------------------------------------
# Reference import machinery (same shims as test_reference_golden.py)
# --------------------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_concept_modules():
    def shim(name, **attrs):
        if name in sys.modules:
            return
        module = types.ModuleType(name)
        module.__version__ = "0.0.0"
        for attr, value in attrs.items():
            setattr(module, attr, value)
        sys.modules[name] = module

    dnf = type("DistributionNotFound", (Exception,), {})
    shim(
        "pkg_resources",
        DistributionNotFound=dnf,
        require=lambda name: (_ for _ in ()).throw(dnf()),
    )
    shim("pytz", timezone=lambda name: zoneinfo.ZoneInfo(name))
    shim("gdown", download=lambda *a, **k: None)
    shim("dotenv", load_dotenv=lambda *a, **k: None)
    # Satisfies the function-level `import spacy`; never used for NLP. The
    # Language attribute keeps datasets' dill fingerprinting happy (it probes
    # `issubclass(obj, spacy.Language)` whenever "spacy" is importable).
    shim("spacy", Language=type("Language", (), {}))

    class _PlainFormatter(logging.Formatter):
        def __init__(self, fmt=None, *args, **kwargs):
            if isinstance(fmt, str):
                fmt = fmt.replace("%(log_color)s", "").replace("%(reset)s", "")
            super().__init__(fmt)

    shim("colorlog", ColoredFormatter=_PlainFormatter, StreamHandler=logging.StreamHandler)

    class _NullWriter:
        def __init__(self, *a, **k):
            self.__dict__.update(k)

        def dumps(self):
            return ""

    shim("pytablewriter", LatexTableWriter=_NullWriter, MarkdownTableWriter=_NullWriter)

    sys.path.insert(0, str(REFERENCE))
    try:
        ref_text = importlib.import_module("src.data.pipelines.text._text")
        ref_text_pkg = importlib.import_module("src.data.pipelines.text")
        ref_group = importlib.import_module("src.data.metrics._group")
    finally:
        sys.path.remove(str(REFERENCE))
    try:
        yield ref_text, ref_text_pkg, ref_group
    finally:
        for name in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
            del sys.modules[name]


@pytest.fixture()
def stubbed_both(ref_concept_modules, monkeypatch):
    """Inject the stub NLP + stub encoder into the reference AND into ours."""
    ref_text, ref_text_pkg, ref_group = ref_concept_modules
    stub = _StubNLP()
    monkeypatch.setattr(ref_text, "spacy_model", stub)
    # _group.py resolves `from src.data.pipelines.text import encode_sentence_bert`
    # at call time -> patch the attribute on the package module.
    monkeypatch.setattr(ref_text_pkg, "encode_sentence_bert", _ref_encode_sentence_bert_stub)

    # datasets>=3 returns lazy Column objects from `ds[col]`; the reference was
    # written against the old behavior where a torch-formatted column access
    # returned a stacked tensor (e.g. `pairs_data[...].unsqueeze(1)`,
    # _group.py:301). Restore that behavior for the reference's execution only.
    import datasets as hf_datasets
    import torch

    orig_getitem = hf_datasets.Dataset.__getitem__

    def compat_getitem(self, key):
        out = orig_getitem(self, key)
        if isinstance(out, hf_datasets.arrow_dataset.Column):
            vals = list(out)
            if (
                vals
                and all(isinstance(v, torch.Tensor) for v in vals)
                and len({tuple(v.shape) for v in vals}) == 1
            ):
                return torch.stack(vals)
            return vals
        return out

    monkeypatch.setattr(hf_datasets.Dataset, "__getitem__", compat_getitem)

    import lmms_owc_tpu.pipelines.text as ours_text

    monkeypatch.setattr(ours_text, "_spacy_model", stub)
    monkeypatch.setattr(ours_text, "_sentence_encoder", _StubEncoder())
    return ref_text, ref_group


def _corpus():
    return [
        "The Golden Retriever runs in the park",
        "his favorite airplane model 747 on a runway",
        "a photo of the image",  # skip-word bait after prefix strip
        "THE the the",
        "spotted | pipe delimiter text",
        "an oak tree an oak tree",  # duplicate chunks
        "x",
        "their giant sunflower field with three hundred flowers",
        "its 2 goldfish",
        "one",
    ]


SKIP = ["image", "photo", "one", "the park", "runway"]


class TestConceptExtractionGolden:
    @pytest.mark.parametrize("remove_prefix_words", [True, False])
    @pytest.mark.parametrize("skip_words", [[], SKIP])
    def test_batch_mode(self, stubbed_both, remove_prefix_words, skip_words):
        ref_text, _ = stubbed_both
        from lmms_owc_tpu.pipelines.text import concept_extraction

        texts = _corpus()
        theirs = ref_text.concept_extraction_spacy(
            {"text": list(texts)},
            input_column="text",
            skip_words=list(skip_words),
            remove_prefix_words=remove_prefix_words,
        )["text_concepts"]
        mine = concept_extraction(
            texts, skip_words=list(skip_words), remove_prefix_words=remove_prefix_words
        )
        assert mine == theirs

    def test_single_string_mode(self, stubbed_both):
        """Reference's non-list branch vs ours on a singleton list."""
        ref_text, _ = stubbed_both
        from lmms_owc_tpu.pipelines.text import concept_extraction

        for text in _corpus():
            theirs = ref_text.concept_extraction_spacy(
                {"text": text},
                input_column="text",
                skip_words=SKIP,
                remove_prefix_words=True,
            )["text_concepts"]
            assert concept_extraction([text], skip_words=SKIP, remove_prefix_words=True) == [theirs]


class TestConceptSimilarityReduceGolden:
    def _items(self):
        refs = [
            "golden retriever", "boeing 747", "oak", "sunflower",
            "goldfish", "texture", "dog", "airplane", "tree", "flower",
        ]
        preds = _corpus()
        # task protocol: item = (ref, pred); list-wrapped variants exercise the
        # ref[0] / pred[-1] unwrap.
        items = [(r, p) for r, p in zip(refs, preds)]
        items[3] = ([refs[3]], [preds[3], preds[3] + " extra turn"])
        return items

    @pytest.mark.parametrize("reduce", ["max", "mean", "median", "min"])
    def test_scalar_reduces(self, stubbed_both, reduce):
        _, ref_group = stubbed_both
        from lmms_owc_tpu.metrics._group import concept_semantic_similarity as ours

        items = self._items()
        theirs = ref_group.concept_semantic_similarity(list(items), reduce=reduce)
        mine = ours(list(items), reduce=reduce)
        assert mine == pytest.approx(theirs, abs=1e-5)

    def test_reduce_none(self, stubbed_both):
        _, ref_group = stubbed_both
        from lmms_owc_tpu.metrics._group import concept_semantic_similarity as ours

        items = self._items()
        theirs = ref_group.concept_semantic_similarity(list(items), reduce="none")
        mine = ours(list(items), reduce="none")
        assert len(mine) == len(theirs)
        for (my_concepts, my_sims), (ref_concepts, ref_sims) in zip(mine, theirs):
            assert my_concepts == list(ref_concepts)
            assert my_sims == pytest.approx(list(ref_sims), abs=1e-5)
