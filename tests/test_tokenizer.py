"""Tokenizer parity: the from-scratch tokenizer.json pipeline vs the HF
`tokenizers` reference library, on synthetic tokenizer files mirroring the
structures used by the open_clip zoo (CLIP byte-level BPE with </w>,
SigLIP-style Unigram/Metaspace, BERT WordPiece).

The reference delegates tokenization entirely to the `tokenizers` crate
(reference: src/text.rs:68-85); these tests pin our reimplementation to the
same library's behavior, including the fixed-pad/truncate contract.
"""

import json

import numpy as np
import pytest

from clip_embedder_tpu.tokenizer import Tokenizer

hf_tokenizers = pytest.importorskip("tokenizers")


def make_clip_style_spec():
    """A miniature of openai CLIP's tokenizer.json: byte-level BPE with
    end-of-word suffix, NFC+collapse+lowercase normalizer, CLIP split regex,
    and <|startoftext|>/<|endoftext|> template."""
    words = ["a", "photo", "of", "cat", "dog", "the", "beignet", "!", ",", "2"]
    # Build a char-level alphabet plus whole-word merges.
    alphabet = sorted({c for w in words for c in w})
    vocab = {}
    for c in alphabet:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = []

    def add_word(w):
        # build the word left-to-right: (a b), (ab c), ...
        parts = list(w[:-1]) + [w[-1] + "</w>"]
        while len(parts) > 1:
            merges.append(f"{parts[0]} {parts[1]}")
            merged = parts[0] + parts[1]
            if merged not in vocab:
                vocab[merged] = len(vocab)
            parts = [merged] + parts[2:]

    for w in words:
        if len(w) > 1:
            add_word(w)
    sot = "<|startoftext|>"
    eot = "<|endoftext|>"
    vocab[sot] = len(vocab)
    vocab[eot] = len(vocab)
    return {
        "version": "1.0",
        "added_tokens": [
            {"id": vocab[sot], "content": sot, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False, "special": True},
            {"id": vocab[eot], "content": eot, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False, "special": True},
        ],
        "normalizer": {"type": "Sequence", "normalizers": [
            {"type": "NFC"},
            {"type": "Replace", "pattern": {"Regex": "\\s+"}, "content": " "},
            {"type": "Lowercase"},
        ]},
        "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "Split",
             "pattern": {"Regex": "'s|'t|'re|'ve|'m|'ll|'d|[\\p{L}]+|[\\p{N}]|[^\\s\\p{L}\\p{N}]+"},
             "behavior": "Removed", "invert": True},
            {"type": "ByteLevel", "add_prefix_space": False, "use_regex": False,
             "trim_offsets": True},
        ]},
        "post_processor": {"type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": sot, "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": eot, "type_id": 0}},
            ],
            "pair": [],
            "special_tokens": {
                sot: {"id": sot, "ids": [vocab[sot]], "tokens": [sot]},
                eot: {"id": eot, "ids": [vocab[eot]], "tokens": [eot]},
            }},
        "model": {"type": "BPE", "dropout": None, "unk_token": None,
                  "continuing_subword_prefix": None, "end_of_word_suffix": "</w>",
                  "fuse_unk": False, "byte_fallback": False,
                  "vocab": vocab, "merges": merges},
    }


def make_unigram_spec():
    """SigLIP/T5-style: Metaspace pre-tokenizer + Unigram model + </s>."""
    pieces = [
        ["<unk>", 0.0], ["</s>", 0.0], ["<pad>", 0.0],
        ["▁a", -2.0], ["▁photo", -3.0], ["▁of", -2.5], ["▁cat", -3.0],
        ["▁dog", -3.0], ["▁", -1.5], ["a", -4.0], ["c", -4.0], ["t", -4.0],
        ["o", -4.0], ["d", -4.0], ["g", -4.0], ["p", -4.0], ["h", -4.0],
        ["f", -4.0], ["s", -4.0], ["▁the", -2.8], ["e", -4.0],
    ]
    return {
        "version": "1.0",
        "added_tokens": [
            {"id": 1, "content": "</s>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
            {"id": 2, "content": "<pad>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
        ],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                          "prepend_scheme": "always", "split": True},
        "post_processor": {"type": "TemplateProcessing",
            "single": [{"Sequence": {"id": "A", "type_id": 0}},
                       {"SpecialToken": {"id": "</s>", "type_id": 0}}],
            "pair": [],
            "special_tokens": {"</s>": {"id": "</s>", "ids": [1], "tokens": ["</s>"]}}},
        "model": {"type": "Unigram", "unk_id": 0, "vocab": pieces,
                  "byte_fallback": False},
    }


def make_wordpiece_spec():
    vocab_list = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of",
                  "cat", "##s", "do", "##g", "the"]
    vocab = {w: i for i, w in enumerate(vocab_list)}
    return {
        "version": "1.0",
        "added_tokens": [],
        "normalizer": {"type": "BertNormalizer", "clean_text": True,
                       "handle_chinese_chars": True, "strip_accents": None,
                       "lowercase": True},
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "post_processor": {"type": "TemplateProcessing",
            "single": [{"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                       {"Sequence": {"id": "A", "type_id": 0}},
                       {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
            "pair": [],
            "special_tokens": {
                "[CLS]": {"id": "[CLS]", "ids": [2], "tokens": ["[CLS]"]},
                "[SEP]": {"id": "[SEP]", "ids": [3], "tokens": ["[SEP]"]}}},
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##",
                  "max_input_chars_per_word": 100, "vocab": vocab},
    }


TEXTS = [
    "A photo of a cat",
    "a  PHOTO of, the dog!",
    "the cat2",
    "",
    "beignet",
    "cat cat cat cat cat cat cat cat cat cat",  # exercises truncation
]


@pytest.mark.parametrize(
    "spec_factory", [make_clip_style_spec, make_unigram_spec, make_wordpiece_spec],
    ids=["clip-bpe", "unigram", "wordpiece"],
)
def test_encode_matches_hf(tmp_path, spec_factory):
    spec = spec_factory()
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(spec), encoding="utf-8")

    ours = Tokenizer.from_file(path)
    theirs = hf_tokenizers.Tokenizer.from_file(str(path))

    for text in TEXTS:
        got = ours.encode(text)
        ref = theirs.encode(text).ids
        assert got == ref, f"mismatch on {text!r}: {got} vs {ref}"


def test_fixed_padding_and_truncation_matches_hf(tmp_path):
    """Reference semantics: PaddingStrategy::Fixed(ctx) + truncation
    (reference: src/text.rs:76-85)."""
    spec = make_clip_style_spec()
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(spec), encoding="utf-8")
    ctx = 8
    pad_id = 0

    ours = Tokenizer.from_file(path)
    ours.with_padding(length=ctx, pad_id=pad_id).with_truncation(max_length=ctx)

    theirs = hf_tokenizers.Tokenizer.from_file(str(path))
    theirs.enable_padding(length=ctx, pad_id=pad_id)
    theirs.enable_truncation(max_length=ctx)

    ids, mask = ours.encode_batch(TEXTS)
    ref = theirs.encode_batch(TEXTS)
    ref_ids = np.array([e.ids for e in ref])
    ref_mask = np.array([e.attention_mask for e in ref])
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(mask, ref_mask)


def test_pad_token_vocab_lookup(tmp_path):
    """Pad-id fallback to the '<pad>' vocab entry
    (reference: src/text.rs:70-73)."""
    spec = make_unigram_spec()
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(spec), encoding="utf-8")
    tok = Tokenizer.from_file(path)
    assert tok.get_vocab(True).get("<pad>") == 2


def test_fuzz_random_strings_match_hf(tmp_path):
    """Randomized parity sweep: mixed-script unicode, whitespace runs,
    punctuation, long words — our pipeline must match HF `tokenizers`
    token-for-token on all three model types."""
    import random

    rng = random.Random(0)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n.,!?'\"-_()[]{}@#$%^&*+=/\\|~`"
        "àéîöûçñßøæœ"
        "αβγδεζη"
        "абвгде"
        "日本語中文한국어"
        "🙂🚀🎉"
        "​ "
    )

    def random_text():
        n = rng.randint(0, 60)
        return "".join(rng.choice(alphabet) for _ in range(n))

    texts = [random_text() for _ in range(300)]

    for factory in (make_clip_style_spec, make_unigram_spec, make_wordpiece_spec):
        spec = factory()
        path = tmp_path / "tok.json"
        path.write_text(json.dumps(spec), encoding="utf-8")
        ours = Tokenizer.from_file(path)
        theirs = hf_tokenizers.Tokenizer.from_file(str(path))
        for text in texts:
            got = ours.encode(text)
            ref = theirs.encode(text).ids
            assert got == ref, f"{factory.__name__} mismatch on {text!r}: {got} vs {ref}"


def test_normalized_added_token_matches_after_normalization(tmp_path):
    """HF semantics: added tokens with normalized=true are matched against
    the *normalized* text (so case variants hit the special id under a
    Lowercase normalizer)."""
    spec = make_clip_style_spec()
    # flip the eot token to normalized=true
    for tok in spec["added_tokens"]:
        if tok["content"] == "<|endoftext|>":
            tok["normalized"] = True
    path = tmp_path / "tok.json"
    path.write_text(json.dumps(spec))
    ours = Tokenizer.from_file(path)
    theirs = hf_tokenizers.Tokenizer.from_file(str(path))
    for text in ["cat <|ENDOFTEXT|> dog", "cat <|endoftext|> dog", "<|EndOfText|>"]:
        assert ours.encode(text) == theirs.encode(text).ids, text


def test_unigram_low_score_piece_beats_unk(tmp_path):
    """SentencePiece unk score is min_score-10: a real piece with a very
    low log-prob must still win over the unknown path."""
    spec = {
        "version": "1.0",
        "added_tokens": [],
        "normalizer": None,
        "pre_tokenizer": {"type": "WhitespaceSplit"},
        "post_processor": None,
        "model": {"type": "Unigram", "unk_id": 0,
                  "vocab": [["<unk>", 0.0], ["xy", -30.0], ["y", -5.0]],
                  "byte_fallback": False},
    }
    path = tmp_path / "tok.json"
    path.write_text(json.dumps(spec))
    ours = Tokenizer.from_file(path)
    theirs = hf_tokenizers.Tokenizer.from_file(str(path))
    assert ours.encode("xy") == theirs.encode("xy").ids == [1]


def test_padding_without_truncation_keeps_eot(tmp_path):
    """with_padding(length) and NO with_truncation: overlong text must
    still end in EOT inside the [B, pad_to] window (content truncates
    before post-processing; a blind tail slice would cut the EOT that
    CLIP's argmax pooling depends on)."""
    spec = make_clip_style_spec()
    path = tmp_path / "tok.json"
    path.write_text(json.dumps(spec))
    tok = Tokenizer.from_file(path)
    eot = spec["added_tokens"][1]["id"]
    tok.with_padding(length=8, pad_id=0)
    ids, mask = tok.encode_batch(["a photo of the cat dog beignet " * 10])
    assert ids.shape == (1, 8)
    assert mask[0].all()
    assert ids[0, -1] == eot


def test_replace_normalizer_literal_content(tmp_path):
    """Replace content is a LITERAL string (HF semantics) — backslashes
    must not be interpreted as regex template escapes."""
    spec = make_clip_style_spec()
    spec["normalizer"] = {"type": "Replace",
                          "pattern": {"String": "o"},
                          "content": "\\1\\"}
    path = tmp_path / "tok2.json"
    path.write_text(json.dumps(spec))
    tok = Tokenizer.from_file(path)
    # must not raise "bad escape"; and the content is inserted literally
    out = tok.normalizer("of")
    assert out == "\\1\\f"


def test_split_invert_behaviors_match_hf():
    """Split semantics with invert and each behavior — parity with the HF
    tokenizers library (review: invert dropped non-matching spans)."""
    import regex as _regex

    from clip_embedder_tpu.tokenizer.pretokenizers import _apply_split

    rx = _regex.compile(r"\d+")
    s = "ab12cd34"
    assert _apply_split(s, rx, "Isolated", True) == ["ab", "12", "cd", "34"]
    assert _apply_split(s, rx, "Removed", True) == ["12", "34"]
    assert _apply_split(s, rx, "Isolated", False) == ["ab", "12", "cd", "34"]
    assert _apply_split(s, rx, "Removed", False) == ["ab", "cd"]
    dash = _regex.compile(r"-")
    t = "the-final--countdown"
    assert _apply_split(t, dash, "Isolated", False) == [
        "the", "-", "final", "-", "-", "countdown"]
    assert _apply_split(t, dash, "Contiguous", False) == [
        "the", "-", "final", "--", "countdown"]
    # HF merges only the delimiter adjacent to content; the rest of a
    # delimiter run stands alone (verified against the tokenizers lib)
    assert _apply_split(t, dash, "MergedWithPrevious", False) == [
        "the-", "final-", "-", "countdown"]
    assert _apply_split(t, dash, "MergedWithNext", False) == [
        "the", "-final", "-", "-countdown"]
    assert _apply_split("a--b", dash, "MergedWithPrevious", False) == [
        "a-", "-", "b"]
    assert _apply_split("a--b", dash, "MergedWithNext", False) == [
        "a", "-", "-b"]


def test_punctuation_pretokenizer_ascii_symbols():
    """HF is_punc includes the ASCII symbol chars ($ + < = > ^ \\u0060 | ~)
    that unicode \\p{P} misses."""
    from clip_embedder_tpu.tokenizer.pretokenizers import build_pretokenizer

    fn = build_pretokenizer({"type": "Punctuation"})
    assert fn("a$b+c") == ["a", "$", "b", "+", "c"]
    assert fn("x=y^z") == ["x", "=", "y", "^", "z"]
    assert fn("p|q~r") == ["p", "|", "q", "~", "r"]


def test_metaspace_prepend_first_only_first_piece():
    """prepend_scheme='first' prefixes only the FIRST piece of each encode
    call (per-call state via the reset hook), matching HF."""
    from clip_embedder_tpu.tokenizer.pretokenizers import build_pretokenizer

    seq = build_pretokenizer({"type": "Sequence", "pretokenizers": [
        {"type": "Split", "pattern": {"String": "X"},
         "behavior": "Removed", "invert": False},
        {"type": "Metaspace", "replacement": "▁",
         "prepend_scheme": "first"},
    ]})
    seq.reset()
    first = [p for piece in seq("helloXworld") for p in [piece]]
    assert first[0].startswith("▁")
    assert not any(p.startswith("▁") for p in first[1:]), first
    # a new call after reset is "first" again
    seq.reset()
    again = seq("helloXworld")
    assert again == first


def test_wordpiece_missing_unk_raises(tmp_path):
    """A WordPiece vocab without the declared unk token must raise (HF
    parity), not silently drop whole words."""
    from clip_embedder_tpu.errors import TokenizerError
    from clip_embedder_tpu.tokenizer.models import WordPiece

    wp = WordPiece({"vocab": {"hello": 0, "##o": 1}, "unk_token": "[UNK]"})
    assert wp.tokenize("hello") == [0]
    with pytest.raises(TokenizerError, match="UNK"):
        wp.tokenize("zzz")


def test_schema_invalid_tokenizer_json_raises_typed(tmp_path):
    """Valid JSON with an invalid tokenizer schema (model section missing
    its vocab) must raise TokenizerError, not a raw KeyError — HF
    `tokenizers` fails typed here too (reference src/error.rs Tokenizer)."""
    import json

    from clip_embedder_tpu.errors import TokenizerError
    from clip_embedder_tpu.tokenizer import Tokenizer

    p = tmp_path / "tokenizer.json"
    for bad in ({"model": {"type": "BPE"}},          # missing vocab/merges
                {"model": {"type": "WordPiece"}},    # missing vocab
                {}):                                  # missing model entirely
        p.write_text(json.dumps(bad))
        with pytest.raises(TokenizerError, match="Invalid tokenizer spec"):
            Tokenizer.from_file(p)


def make_unigram_first_spec():
    """Metaspace prepend_scheme='first' variant (Llama-style prefixing)."""
    spec = make_unigram_spec()
    spec["pre_tokenizer"] = {"type": "Metaspace", "replacement": "▁",
                             "prepend_scheme": "first", "split": True}
    return spec


def make_wordpiece_punct_spec(behavior="Isolated"):
    """Whitespace + standalone Punctuation pre-tokenizer variant (covers
    the HF is_punc ASCII-symbol class and _apply_split behaviors)."""
    spec = make_wordpiece_spec()
    spec["pre_tokenizer"] = {"type": "Sequence", "pretokenizers": [
        {"type": "WhitespaceSplit"},
        {"type": "Punctuation", "behavior": behavior},
    ]}
    return spec


def test_fuzz_pretokenizer_variants_match_hf(tmp_path):
    """Same 300-string parity sweep over the pre-tokenizer variants the
    round-2 review fixed (Metaspace 'first', Punctuation symbols)."""
    import random

    rng = random.Random(7)
    alphabet = (
        "abcdefghij  .,!?$+<=>^`|~%&*()-_"
        "αβγ абв 日本 🙂"
    )

    def random_text():
        n = rng.randint(0, 40)
        return "".join(rng.choice(alphabet) for _ in range(n))

    texts = [random_text() for _ in range(300)]
    factories = [make_unigram_first_spec, make_wordpiece_punct_spec] + [
        (lambda b=b: make_wordpiece_punct_spec(b))
        for b in ("Removed", "MergedWithPrevious", "MergedWithNext",
                  "Contiguous")
    ]
    for factory in factories:
        spec = factory()
        path = tmp_path / "tokv.json"
        path.write_text(json.dumps(spec), encoding="utf-8")
        ours = Tokenizer.from_file(path)
        theirs = hf_tokenizers.Tokenizer.from_file(str(path))
        for text in texts:
            got = ours.encode(text)
            ref = theirs.encode(text).ids
            assert got == ref, (
                f"{factory.__name__} mismatch on {text!r}: {got} vs {ref}")


def test_metaspace_first_after_leading_added_token(tmp_path):
    """HF counts added-token splits in the global split index: text that
    STARTS with an added token must not get a '▁' prefix on the piece
    after it (parity verified against the tokenizers library)."""
    spec = make_unigram_first_spec()
    path = tmp_path / "tokf.json"
    path.write_text(json.dumps(spec), encoding="utf-8")
    ours = Tokenizer.from_file(path)
    theirs = hf_tokenizers.Tokenizer.from_file(str(path))
    for text in ("</s>cat", "cat</s>dog", "</s>", "a photo</s> of"):
        assert ours.encode(text) == theirs.encode(text).ids, text


def test_duplicate_embedder_tokenizers_independent(tmp_path):
    """duplicate() clones the tokenizer so replicas stay independently
    usable (Metaspace 'first' state is per-instance)."""
    spec = make_unigram_first_spec()
    path = tmp_path / "tokd.json"
    path.write_text(json.dumps(spec), encoding="utf-8")
    tok = Tokenizer.from_file(path)
    clone = tok.clone()
    assert clone is not tok
    assert clone.encode("a cat") == tok.encode("a cat")
