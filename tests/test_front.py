"""Text frontend tests: CJK tokenization, normalizer mechanics, sentencepiece
BPE, sentence splitting — executable versions of the reference's self-test
cases (front.py:432-537)."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.utils.front import (
    TextNormalizer, TextTokenizer, tokenize_by_cjk_char,
    de_tokenize_by_cjk_char)
from index_tts_dubbing_tpu.utils import sp_model
from index_tts_dubbing_tpu.utils.tn import zh_int, zh_number, en_int, en_number


def test_cjk_tokenize_roundtrip():
    assert tokenize_by_cjk_char("你好世界是 hello world 的中文") == \
        "你 好 世 界 是 HELLO WORLD 的 中 文"
    assert de_tokenize_by_cjk_char("你 好 世 界 是 HELLO WORLD 的 中 文",
                                   do_lower_case=True) == "你好世界是hello world的中文"


def test_zh_numbers():
    assert zh_int(0) == "零"
    assert zh_int(10) == "十"
    assert zh_int(14) == "十四"
    assert zh_int(200) == "二百"
    assert zh_int(465) == "四百六十五"
    assert zh_int(1024) == "一千零二十四"
    assert zh_int(12999) == "一万二千九百九十九"
    assert zh_int(3150000) == "三百一十五万"
    assert zh_number("2.5") == "二点五"
    assert zh_number("-3") == "负三"


def test_en_numbers():
    assert en_int(0) == "zero"
    assert en_int(21) == "twenty one"
    assert en_int(465) == "four hundred sixty five"
    assert en_int(12999) == "twelve thousand nine hundred ninety nine"
    assert en_number("2.5") == "two point five"


@pytest.fixture(scope="module")
def norm():
    n = TextNormalizer()
    n.load()
    return n


def test_normalizer_contractions(norm):
    out = norm.normalize("where's the money?")
    assert "where is" in out
    out = norm.normalize("今天是个好日子 it's a good day")
    assert "it is" in out


def test_normalizer_pinyin_preserved(norm):
    out = norm.normalize("晕XUAN4是一种GAN3觉")
    assert "XVAN4" in out  # jqx correction applies to xuan4 → XVAN4
    assert "GAN3" in out
    out = norm.normalize("受不liao3你了")
    assert "LIAO3" in out.upper()


def test_normalizer_names_preserved(norm):
    out = norm.normalize("克里斯托弗·诺兰执导了这部电影")
    assert "克里斯托弗" in out and "诺兰" in out


def test_normalizer_zh_numbers(norm):
    out = norm.normalize("共465篇，约315万字")
    assert "四百六十五" in out
    out = norm.normalize("这是1024元的手机")
    assert "一千零二十四" in out


def test_normalizer_en_numbers(norm):
    out = norm.normalize("This sales for 2.5% off, only $12.5.")
    assert "two point five percent" in out
    assert "twelve point five dollars" in out
    out = norm.normalize("See you at 8:00 AM")
    assert "eight o'clock" in out


def test_normalizer_charmap(norm):
    out = norm.normalize("我爱你！")
    assert out.endswith("!")
    out = norm.normalize("“我爱你”的英语是“I love you”")
    assert "“" not in out and "”" not in out


# --- sentencepiece BPE ------------------------------------------------------

def _toy_model(tmp_path):
    pieces = [sp_model.Piece("<s>", 0.0, sp_model.TYPE_CONTROL),
              sp_model.Piece("</s>", 0.0, sp_model.TYPE_CONTROL),
              sp_model.Piece("<unk>", 0.0, sp_model.TYPE_UNKNOWN)]
    vocab = ["▁", "a", "b", "c", "ab", "▁ab", "abc", "▁c", ".", "▁."]
    scores = [-1.0, -2.0, -2.1, -2.2, -0.5, -0.4, -0.3, -0.6, -2.5, -1.5]
    for v, s in zip(vocab, scores):
        pieces.append(sp_model.Piece(v, s))
    p = tmp_path / "toy.model"
    p.write_bytes(sp_model.write_model(pieces))
    return p


def test_sp_roundtrip(tmp_path):
    path = _toy_model(tmp_path)
    sp = sp_model.SentencePieceBPE.from_file(str(path))
    assert sp.get_piece_size() == 13
    assert sp.unk_id() == 2
    assert sp.piece_to_id("▁ab") == sp.vocab["▁ab"]
    # "abc" merges a+b → ab, ab+c → abc; with dummy prefix "▁abc" absent →
    # highest-score path keeps ▁ab + c? abc exists (score -0.3).
    pieces = sp.encode_as_pieces("ab c")
    assert all(p in sp.vocab or p == "<unk>" for p in pieces)
    ids = sp.encode("ab c")
    assert sp.decode(ids).replace(" ", "") == "abc"


def test_tokenizer_and_split(tmp_path):
    path = _toy_model(tmp_path)
    tok = TextTokenizer(str(path), normalizer=None)
    toks = tok.tokenize("ab c. ab c. ab")
    assert isinstance(toks, list) and toks
    sents = tok.split_sentences(toks, max_tokens_per_sentence=4)
    assert sum(len(s) for s in sents) == len(toks)
    for s in sents:
        assert len(s) <= 4 or len(s) <= len(toks)


def test_split_sentences_spec():
    """Splitting behaviour per front.py:345-415 on synthetic token lists."""
    t = TextTokenizer
    toks = list("aaaa.bbbb.cc")
    sents = t.split_sentences_by_token(toks, ["."], 100)
    assert ["".join(s) for s in sents] == ["aaaa.bbbb.cc"]  # merged (≤100)
    sents = t.split_sentences_by_token(toks, ["."], 6)
    assert ["".join(s) for s in sents] == ["aaaa.", "bbbb.", "cc"]
    # over-long run with comma fallback
    toks = list("aaaa,bbbb,cccc")
    sents = t.split_sentences_by_token(toks, ["."], 6)
    assert all(len(s) <= 6 for s in sents)
    assert "".join("".join(s) for s in sents) == "aaaa,bbbb,cccc"
