"""BPE tokenizer: hand-computed merges and round-trip."""
from mqdet_tpu.data.bpe_tokenizer import BPETokenizer, bytes_to_unicode


def make_tok():
    # tiny merge table: merge l+o -> lo, lo+w</w> -> low</w>, h+e -> he
    merges = [("l", "o"), ("lo", "w</w>"), ("h", "e")]
    return BPETokenizer(merges)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_bpe_merges():
    tok = make_tok()
    assert tok.bpe("low") == "low</w>"
    assert tok.bpe("lower") == "lo w e r</w>"  # lo merges; w/e/r stay
    assert tok.bpe("hello") == "he l lo</w>" or tok.bpe("hello") == "he l l o</w>"


def test_encode_decode_roundtrip():
    tok = make_tok()
    ids = tok.encode("low lower")
    text = tok.decode(ids)
    assert text.strip() == "low lower"


def test_tokenize_padding():
    tok = make_tok()
    ids, mask = tok.tokenize(["low"], context_length=8)
    assert ids.shape == (1, 8)
    assert mask[0].sum() == 3  # sot + low</w> + eot
