"""Golden parity for the vendored zero-egress tokenizers.

HF BertTokenizer / CLIPTokenizer can be constructed from *local* vocab
files, so these goldens run with zero egress: build a mini vocab in tmpdir,
tokenize a caption battery with both HF and the vendored implementation,
assert identical ids (incl. truncation + padding). Matches the reference's
tokenization entry points ``/root/reference/frido/modules/encoders/
modules.py:59-83`` (BERT) and ``:159-185`` (CLIP).
"""

import json

import numpy as np
import pytest

from frido_tpu.text import ClipBPETokenizer, WordPieceTokenizer
from frido_tpu.text.clip_bpe import bytes_to_unicode
from frido_tpu.text.wordpiece import fallback_vocab

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

CAPTIONS = [
    "A man riding a horse on the beach.",
    "Two dogs playing   with a red ball!!",
    "an über-cool café, naïve résumé",            # accents
    "a photo of 猫 and 犬 together",               # CJK isolation
    "Weird\tcontrol\x00chars�here",           # cleanup path
    "unaffable prewordpieceness",                  # multi-piece + unk
    "don't stop; it's $5.99 (99%) #hashtag",       # punctuation
    "x" * 120,                                     # >100 chars -> [UNK]
    "",                                            # empty caption
    "HTTPS://EXAMPLE.COM/PaTh?q=1&r=2",
]


@pytest.fixture(scope="module")
def bert_vocab_file(tmp_path_factory):
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += list("abcdefghijklmnopqrstuvwxyz0123456789")
    toks += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    toks += list(".,!?;:$%#&()'\"-/=")
    toks += ["a", "man", "riding", "horse", "on", "the", "beach", "two",
             "dog", "##s", "play", "##ing", "with", "red", "ball", "photo",
             "of", "and", "together", "un", "##aff", "##able", "don", "t",
             "it", "stop", "猫"]
    seen, uniq = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    p = tmp_path_factory.mktemp("bertvocab") / "vocab.txt"
    p.write_text("\n".join(uniq) + "\n", encoding="utf-8")
    return str(p)


def test_wordpiece_matches_hf(bert_vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(bert_vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(bert_vocab_file)
    for cap in CAPTIONS:
        for max_length in (77, 8):
            got = ours([cap], max_length=max_length)[0].tolist()
            want = hf([cap], truncation=True, max_length=max_length,
                      padding="max_length")["input_ids"][0]
            assert got == want, (cap, max_length, got, want)


def test_wordpiece_batch_shape(bert_vocab_file):
    ours = WordPieceTokenizer(bert_vocab_file)
    out = ours(CAPTIONS, max_length=77)
    assert out.shape == (len(CAPTIONS), 77) and out.dtype == np.int32


def test_wordpiece_fallback_vocab_always_tokenizes():
    """The built-in char vocab never UNKs latin text, keeps bert's special
    ids, stays deterministic across constructions."""
    v = fallback_vocab()
    assert v["[PAD]"] == 0 and v["[UNK]"] == 100 and v["[CLS]"] == 101
    assert v["[SEP]"] == 102 and v["[MASK]"] == 103 and len(v) == 30522
    tok = WordPieceTokenizer()
    ids = tok(CAPTIONS, max_length=77)
    assert ids.shape == (len(CAPTIONS), 77)
    unk = 100
    # latin captions must not collapse to [UNK] (only the >100-char one may)
    assert (ids[0] == unk).sum() == 0
    assert np.array_equal(ids, WordPieceTokenizer()(CAPTIONS, max_length=77))


@pytest.fixture(scope="module")
def clip_vocab_dir(tmp_path_factory):
    """Mini byte-level BPE: all 256 byte symbols (+ </w> forms) so nothing
    is unk-able, plus a handful of real merges to exercise the merge loop."""
    b2u = bytes_to_unicode()
    syms = [b2u[b] for b in range(256)]
    vocab = syms + [s + "</w>" for s in syms]
    merges = ["t h", "th e</w>", "a n", "an d</w>", "d o", "do g</w>",
              "i n", "in g</w>", "r i", "ri d", "rid ing</w>"]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab.append(tok)
    vocab += ["ing</w>", "<|startoftext|>", "<|endoftext|>"]
    d = tmp_path_factory.mktemp("clipvocab")
    (d / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(vocab)}), encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n", encoding="utf-8")
    return str(d)


def test_clip_bpe_matches_hf(clip_vocab_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(clip_vocab_dir + "/vocab.json",
                                    clip_vocab_dir + "/merges.txt")
    ours = ClipBPETokenizer(clip_vocab_dir + "/vocab.json",
                            clip_vocab_dir + "/merges.txt")
    for cap in CAPTIONS:
        for max_length in (77, 8):
            got = ours([cap], max_length=max_length)[0].tolist()
            want = hf([cap], truncation=True, max_length=max_length,
                      padding="max_length")["input_ids"][0]
            assert got == want, (cap, max_length, got, want)


def test_clip_fallback_vocab():
    tok = ClipBPETokenizer()
    ids = tok(CAPTIONS, max_length=77)
    assert ids.shape == (len(CAPTIONS), 77) and ids.dtype == np.int32
    assert (ids[:, 0] == tok.bos_id).all()
    assert np.array_equal(ids, ClipBPETokenizer()(CAPTIONS, max_length=77))


def test_bert_embedder_tokenizes_without_network(monkeypatch):
    """VERDICT #4 acceptance: the t2i text path gets past tokenization with
    zero egress (no HF cache)."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.delenv("FRIDO_TPU_BERT_VOCAB", raising=False)
    from frido_tpu.nn.encoders import BERTEmbedder

    emb = BERTEmbedder(n_embed=64, n_layer=1, use_tokenizer=True)
    with pytest.warns(UserWarning, match="char-fallback"):
        toks = emb.tokenize(["a man riding a horse", "two dogs"])
    assert toks.shape == (2, 77) and toks.dtype == np.int32
    assert toks.max() < 30522


def test_fallback_vocab_raises_in_strict_mode(monkeypatch):
    """Checkpoint-consuming entry points set FRIDO_TPU_STRICT_VOCAB so an
    imported torch checkpoint can't silently sample garbage through the
    fallback vocab's incompatible ids (scripts/sample_diffusion.py)."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.delenv("FRIDO_TPU_BERT_VOCAB", raising=False)
    monkeypatch.setenv("FRIDO_TPU_STRICT_VOCAB", "1")
    from frido_tpu.nn.encoders import BERTTokenizerHost

    with pytest.raises(RuntimeError, match="strict mode"):
        BERTTokenizerHost()


def test_bert_embedder_env_vocab(bert_vocab_file, monkeypatch):
    monkeypatch.setenv("FRIDO_TPU_BERT_VOCAB", bert_vocab_file)
    from frido_tpu.nn.encoders import BERTEmbedder

    emb = BERTEmbedder(n_embed=64, n_layer=1, use_tokenizer=True)
    toks = emb.tokenize(["a man riding a horse"])
    ours = WordPieceTokenizer(bert_vocab_file)(["a man riding a horse"])
    assert np.array_equal(toks, ours)


# ---------------------------------------------------------------------------
# vendoring hook (frido_tpu.text.vendor) — VERDICT r2 task 5
# ---------------------------------------------------------------------------

@pytest.fixture
def vendor_tmp(tmp_path, monkeypatch):
    """Redirect the vendored-assets dir to tmp so tests never write into
    the repo tree."""
    from frido_tpu.text import vendor

    d = tmp_path / "vendored"
    monkeypatch.setattr(vendor, "VENDOR_DIR", str(d))
    monkeypatch.setattr(vendor, "MANIFEST", str(d / "MANIFEST.json"))
    return vendor


def test_vendor_bert_roundtrip(vendor_tmp, bert_vocab_file, monkeypatch):
    vendor = vendor_tmp
    p = vendor.vendor_bert(bert_vocab_file)
    assert vendor.bert_vocab_path() == p
    assert vendor.verify() == []
    # the host tokenizer resolves the vendored copy with no env vars set
    monkeypatch.delenv("FRIDO_TPU_BERT_VOCAB", raising=False)
    monkeypatch.delenv("FRIDO_TPU_BERT_TOKENIZER", raising=False)
    from frido_tpu.nn.encoders import BERTTokenizerHost

    host = BERTTokenizerHost()
    want = WordPieceTokenizer(bert_vocab_file)(["a man riding a horse"])
    assert np.array_equal(host(["a man riding a horse"]), want)
    # env var still takes precedence over the vendored copy
    monkeypatch.setenv("FRIDO_TPU_BERT_VOCAB", bert_vocab_file)
    assert np.array_equal(BERTTokenizerHost()(["two dogs"]),
                          WordPieceTokenizer(bert_vocab_file)(["two dogs"]))


def test_vendor_clip_roundtrip(vendor_tmp, clip_vocab_dir, monkeypatch):
    vendor = vendor_tmp
    v, m = vendor.vendor_clip(clip_vocab_dir + "/vocab.json",
                              clip_vocab_dir + "/merges.txt")
    assert vendor.clip_vocab_paths() == (v, m)
    assert vendor.verify() == []
    monkeypatch.delenv("FRIDO_TPU_CLIP_VOCAB", raising=False)
    monkeypatch.delenv("FRIDO_TPU_CLIP_TOKENIZER", raising=False)
    from frido_tpu.nn.encoders import CLIPTokenizerHost

    host = CLIPTokenizerHost("openai/clip-vit-large-patch14")
    want = ClipBPETokenizer(clip_vocab_dir + "/vocab.json",
                            clip_vocab_dir + "/merges.txt")(["the dog"])
    assert np.array_equal(host(["the dog"]), want)


def test_vendor_verify_detects_drift(vendor_tmp, bert_vocab_file):
    vendor = vendor_tmp
    p = vendor.vendor_bert(bert_vocab_file)
    with open(p, "a", encoding="utf-8") as f:
        f.write("extra_token\n")
    problems = vendor.verify()
    assert problems and "drift" in problems[0]


def test_vendor_rejects_non_vocab(vendor_tmp, tmp_path):
    bad = tmp_path / "not_a_vocab.txt"
    bad.write_text("just\nsome\nwords\n", encoding="utf-8")
    with pytest.raises(ValueError, match="PAD"):
        vendor_tmp.vendor_bert(str(bad))


def test_vendor_cli(vendor_tmp, bert_vocab_file, capsys):
    assert vendor_tmp.main([bert_vocab_file]) == 0
    assert "vendored BERT" in capsys.readouterr().out
    assert vendor_tmp.main(["--verify"]) == 0


def test_explicit_tokenizer_env_failure_raises(monkeypatch):
    """ADVICE r2: an explicitly requested tokenizer that fails to load must
    raise, not silently fall back to checkpoint-incompatible ids."""
    monkeypatch.setenv("FRIDO_TPU_BERT_TOKENIZER", "/no/such/tokenizer")
    monkeypatch.delenv("FRIDO_TPU_BERT_VOCAB", raising=False)
    from frido_tpu.nn.encoders import BERTTokenizerHost, CLIPTokenizerHost

    with pytest.raises(RuntimeError, match="refusing"):
        BERTTokenizerHost()
    monkeypatch.setenv("FRIDO_TPU_CLIP_TOKENIZER", "/no/such/tokenizer")
    monkeypatch.delenv("FRIDO_TPU_CLIP_VOCAB", raising=False)
    with pytest.raises(RuntimeError, match="refusing"):
        CLIPTokenizerHost("openai/clip-vit-large-patch14")
