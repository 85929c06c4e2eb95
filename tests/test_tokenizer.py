import sys

import numpy as np
import pytest

from cmh_tpu.models.clip.tokenizer import (
    EOT_ID,
    SOT_ID,
    SimpleTokenizer,
    tokenize_caption,
)

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


@pytest.fixture(scope="module")
def ref_tok():
    """The reference tokenizer, imported from the read-only mount, as oracle.

    ftfy is not installed; for clean ASCII test strings ``ftfy.fix_text`` is
    the identity, so a stub module preserves oracle behavior.
    """
    import importlib.util
    import types

    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    # other tests (ref_shims.load_reference) may have imported the whole
    # reference package already; re-exec'ing the file would trip its
    # registry's duplicate-name guard — reuse the loaded module instead
    if "models.CLIP.simple_tokenizer" in sys.modules:
        return sys.modules["models.CLIP.simple_tokenizer"].SimpleTokenizer()
    try:
        # load the module file directly — the reference package __init__
        # pulls in unavailable deps (xlrd)
        spec = importlib.util.spec_from_file_location(
            "ref_simple_tokenizer",
            "/root/reference/models/CLIP/simple_tokenizer.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.SimpleTokenizer()
    except Exception:
        return None


def test_vocab_size(tok):
    assert tok.vocab_size == 49408
    assert tok.encoder["<|startoftext|>"] == SOT_ID
    assert tok.encoder["<|endoftext|>"] == EOT_ID


def test_encode_decode_roundtrip(tok):
    text = "a photo of a cat sitting on the mat"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


CASES = [
    "a photo of a cat",
    "Two dogs playing in THE park!",
    "skyscraper, bridge & river 123",
    "un petit café",
    "hello-world foo_bar 42nd street",
]


@pytest.mark.parametrize("text", CASES)
def test_parity_with_reference_tokenizer(tok, ref_tok, text):
    if ref_tok is None:
        pytest.skip("reference tokenizer unavailable (ftfy missing)")
    assert tok.encode(text) == ref_tok.encode(text)
    assert tok.tokenize(text) == ref_tok.tokenize(text)


def test_tokenize_caption_packing(tok):
    ids, mask = tokenize_caption(tok, "a photo of a cat", max_words=8)
    assert ids.shape == (8,)
    assert ids[0] == SOT_ID
    assert EOT_ID in ids
    eot_pos = int(np.argmax(ids == EOT_ID))
    assert np.all(ids[eot_pos + 1 :] == 0)
    np.testing.assert_array_equal(mask, ids == 0)


def test_tokenize_caption_truncation(tok):
    long_text = " ".join(["word"] * 100)
    ids, _ = tokenize_caption(tok, long_text, max_words=8)
    assert ids.shape == (8,)
    assert ids[0] == SOT_ID
    assert ids[-1] == EOT_ID  # EOT appended after truncation to max-1


def test_fix_text_mojibake_repair():
    """Vendored ftfy-equivalent: UTF-8-as-cp1252/latin-1 mojibake is
    repaired, clean text (ASCII or real unicode) passes through unchanged."""
    from cmh_tpu.models.clip.tokenizer import fix_text

    # classic single mojibake (utf-8 bytes read as latin-1 / cp1252)
    assert fix_text("cafÃ©") == "café"
    assert fix_text("donâ€™t") == "don’t"          # cp1252-only bytes (0x80-0x9f)
    assert fix_text("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    # double-encoded mojibake needs the iterated pass
    double = "é".encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    assert fix_text(double) == "é"
    # clean inputs are untouched
    assert fix_text("a photo of a cat") == "a photo of a cat"
    assert fix_text("Fußball café 北京") == "Fußball café 北京"
    # NFC normalization (ftfy default): decomposed e + combining acute → é
    assert fix_text("café") == "café"


def test_fix_text_changes_tokenization_of_corrupted_captions(tok):
    from cmh_tpu.models.clip.tokenizer import fix_text

    corrupted = "a cafÃ© in paris"
    assert tok.tokenize(corrupted) == tok.tokenize("a café in paris")
    assert fix_text(corrupted) == "a café in paris"
