"""Text frontend tests: CJK tokenization, normalizer mechanics, sentencepiece
BPE, sentence splitting — executable versions of the reference's self-test
cases (front.py:432-537)."""
import numpy as np
import re
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


# ---------------------------------------------------------------------------
# Reference normalizer corpus (/root/reference/indextts/utils/front.py:437-483
# __main__ self-test inputs) as an executable spec: every case must normalize
# without crashing and leave no unread ASCII digits behind (pinyin tone
# digits like XUAN4 are deliberately preserved placeholders).
# ---------------------------------------------------------------------------

REFERENCE_CASES = [
    "IndexTTS 正式发布1.0版本了，效果666",
    "晕XUAN4是一种GAN3觉",
    "我爱你！",
    "I love you!",
    "“我爱你”的英语是“I love you”",
    "2.5平方电线",
    "共465篇，约315万字",
    "2002年的第一场雪，下在了2003年",
    "速度是10km/h",
    "现在是北京时间2025年01月11日 20:00",
    "他这条裤子是2012年买的，花了200块钱",
    "电话：135-4567-8900",
    "1键3连",
    "他这条视频点赞3000+，评论1000+，收藏500+",
    "这是1024元的手机，你要吗？",
    "受不liao3你了",
    "“衣裳”不读衣chang2，而是读衣shang5",
    "最zhong4要的是：不要chong2蹈覆辙",
    "不zuo1死就不会死",
    "See you at 8:00 AM",
    "8:00 AM 开会",
    "Couting down 3, 2, 1, go!",
    "数到3就开始：1、2、3",
    "This sales for 2.5% off, only $12.5.",
    "5G网络是4G网络的升级版，2G网络是3G网络的前身",
    "苹果于2030/1/2发布新 iPhone 2X 系列手机，最低售价仅 ¥12999",
    "这酒...里...有毒...",
    "只有,,,才是最好的",
    "babala2是什么？",
    "用beta1测试",
    "have you ever been to beta2?",
    "such as XTTS, CosyVoice2, Fish-Speech, and F5-TTS",
    "where's the money?",
    "who's there?",
    "which's the best?",
    "how's it going?",
    "今天是个好日子 it's a good day",
    "约瑟夫·高登-莱维特（Joseph Gordon-Levitt is an American actor）",
    "蒂莫西·唐纳德·库克（英文名：Timothy Donald Cook），通称蒂姆·库克（Tim Cook），美国商业经理、工业工程师和工业开发商，现任苹果公司首席执行官。",
]


@pytest.mark.parametrize("case", REFERENCE_CASES)
def test_reference_corpus_normalizes(norm, case):
    out = norm.normalize(case)
    assert out
    # strip preserved pinyin-tone placeholders, then require no digits left
    residue = re.sub(TextNormalizer.PINYIN_TONE_PATTERN, "", out,
                     flags=re.IGNORECASE)
    assert not re.search(r"\d", residue), f"{case!r} -> {out!r}"


def test_normalizer_golden_zh(norm):
    golden = {
        "2.5平方电线": "二点五平方电线",
        "共465篇，约315万字": "共四百六十五篇,约三百一十五万字",
        "速度是10km/h": "速度是十千米每小时",
        "电话：135-4567-8900": "电话,幺三五四五六七八九零零",
        "他这条视频点赞3000+": "他这条视频点赞三千多",
        "这是1024元的手机，你要吗？": "这是一千零二十四元的手机,你要吗?",
        "1键3连": "一键三连",
        "现在是北京时间2025年01月11日 20:00":
            "现在是北京时间二零二五年一月十一日 二十点",
        "苹果于2030/1/2发布": "苹果于二零三零年一月二日发布",
        "会议定在2023-04-05": "会议定在二零二三年四月五日",
        "中了1/3的概率": "中了三分之一的概率",
        "第3名": "第三名",
        "气温37°C": "气温三十七摄氏度",
        "涨了5%": "涨了百分之五",
        "3~5天": "三到五天",
        # signed / degree quantities
        "气温-5°C": "气温零下五摄氏度",
        "-3~2℃": "零下三到二摄氏度",
        "跌了-0.5%": "跌了负百分之零点五",
        "98.6℉": "九十八点六华氏度",
        # measure-word idiom: lone 2 reads 两, ordinals/dates/decimals keep 二
        "2个人": "两个人",
        "买了2斤苹果": "买了两斤苹果",
        "2年后再见": "两年后再见",
        "2点开会": "两点开会",
        "下午2:30": "下午两点三十分",
        "第2名": "第二名",
        "2月2日": "二月二日",
        "12个": "十二个",
        "2.5个": "二点五个",
        # roman numerals
        "第Ⅱ章": "第二章",
        "罗马数字Ⅶ": "罗马数字七",
        "第ⅻ卷": "第十二卷",
        # currency / quantity ranges
        "3-5元": "三到五元",
        "约3~5万": "约三到五万",
        "30~50块": "三十到五十块",
        "这件要$3-5": "这件要三到五美元",
        "价格¥100-200": "价格一百到二百元",
        # fractions, permille, money depth
        "中了3/4的概率": "中了四分之三的概率",
        "合格率99.9‰": "合格率千分之九十九点九",
        "¥12999": "一万二千九百九十九元",
        "付了12.5元": "付了十二点五元",
        "$99.5": "九十九点五美元",
        # magnitude-suffixed / unit ranges, date/time/percent/degree ranges
        "3万-5万元": "三万到五万元",
        "2024年1月-3月": "二零二四年一月到三月",
        "6月1日-6月3日": "六月一日到六月三日",
        "9:00-18:00": "九点到十八点",
        "50%-80%": "百分之五十到百分之八十",
        "涨了0.5%-1%": "涨了百分之零点五到百分之一",
        "10℃-20℃": "十摄氏度到二十摄氏度",
        # 亿 / 万亿 mixed readings, digit grouping
        "2.3亿用户": "二点三亿用户",
        "涨幅达1.5万亿": "涨幅达一点五万亿",
        "5万亿元": "五万亿元",
        "1亿2000万": "一亿二千万",
        "双十一成交额5403亿元": "双十一成交额五千四百零三亿元",
        "1,024元": "一千零二十四元",
        # phones / digit strings
        "110": "一百一十",
        "拨打13812345678": "拨打幺三八幺二三四五六七八",
        # large cardinals / zeros
        "100000008": "一亿零八",
        "10002": "一万零二",
        "2002年": "二零零二年",
        "0.07": "零点零七",
        # score readings (colon pairs the time rules don't consume)
        "比分3:2": "比分三比二",
        "大比分4:0晋级": "大比分四比零晋级",
        "以2:1逆转": "以二比一逆转",
        "双方0:0收场": "双方零比零收场",
        # ID/account digit-by-digit reading (1 → 幺)
        "工号1024": "工号幺零二四",
        "验证码是8817": "验证码是八八幺七",
        "房间号304": "房间号三零四",
        "邮编100080": "邮编幺零零零八零",
        "热线400-123-4567": "热线四零零幺二三四五六七",
        # currency symbol before a magnitude-suffixed number
        "$3.5万": "三点五万美元",
        "¥2.8亿": "二点八亿元",
        "融资$1.2亿": "融资一点二亿美元",
        # negative quantities outside the unit rules
        "最低-5度": "最低负五度",
        "净利润-3.2万": "净利润负三点二万",
        "海拔-154米": "海拔负一百五十四米",
        # more fractions
        "占2/3多数": "占三分之二多数",
        "进度1/2": "进度二分之一",
        # clock seconds, bare thousands, mixed units
        "用时1:23:45": "用时一点二十三分四十五秒",
        "全长42.195km": "全长四十二点一九五千米",
        "装了500ml水": "装了五百毫升水",
        # euro/pound money, measure-word 两 incl. ordinal/date exclusions
        "票价€50或£20": "票价五十欧元或二十英镑",
        "投资€1.5万": "投资一点五万欧元",
        "看了2集电视剧": "看了两集电视剧",
        "2月2日2点开播2场": "二月二日两点开播两场",
        # magnitude-suffixed counts, year ranges with a single 年
        "共有10万+粉丝": "共有十万多粉丝",
        "2023-2025年规划": "二零二三到二零二五年规划",
        # ㎡ unit sign; arithmetic + is not a count suffix
        "面积80㎡": "面积八十平方米",
        "1+1=2": "一+一=二",
    }
    assert len(golden) >= 80, len(golden)
    for src, want in golden.items():
        assert norm.normalize(src) == want, (src, norm.normalize(src))


def test_normalizer_golden_en(norm):
    golden = {
        "See you at 8:00 AM": "See you at eight o'clock A M",
        "This sales for 2.5% off, only $12.5.":
            "This sales for two point five percent off, only twelve point five dollars.",
        "have you ever been to beta2?": "have you ever been to beta two?",
        "the 1st and the 22nd": "the first and the twenty second",
        "cut it in 1/3": "cut it in one third",
        "call 135-4567-8900": "call one three five four five six seven eight nine zero zero",
        "in 1999": "in nineteen ninety nine",
        "in 2002": "in twenty oh two",
        "prices are $3-5": "prices are three to five dollars",
        "it is -5°C outside": "it is minus five degrees Celsius outside",
        "72°F today": "seventy two degrees Fahrenheit today",
        "a 25% discount": "a twenty five percent discount",
        "3/8 of an inch": "three eighths of an inch",
        # ranges / digit grouping
        "from 1990-1995": "from nineteen ninety to nineteen ninety five",
        "pages 10-20": "pages ten to twenty",
        "2-3 weeks": "two to three weeks",
        "90%-95% ratio": "ninety percent to ninety five percent ratio",
        "a 5.5-inch screen": "a five point five-inch screen",
        "100,000 people": "one hundred thousand people",
        "See you at 7:45": "See you at seven forty five",
        # ordinals incl. irregular/compound
        "the 3rd time": "the third time",
        "ranked 101st": "ranked one hundred first",
        "his 12th birthday": "his twelfth birthday",
        "the 40th floor": "the fortieth floor",
        # signed quantities
        "a loss of -3.5%": "a loss of minus three point five percent",
        "-12 degrees": "minus twelve degrees",
        # oh-minutes, emergency digits, fractions, grouping
        "at 12:05 PM": "at twelve oh five P M",
        "Call 911 now": "Call nine one one now",
        "2/5 done": "two fifths done",
        "only 1,234 left": "only one thousand two hundred thirty four left",
        # dotted am/pm forms keep their space; 'pm.' leaves the sentence
        # dot; word prefixes after a time are never eaten (r05 fix)
        "at 10:30 a.m. we start": "at ten thirty A M we start",
        "at 9:15 P.M. sharp": "at nine fifteen P M sharp",
        "closes at 11:00 pm. Then we left.":
            "closes at eleven o'clock P M. Then we left.",
        "at 10:30 among friends": "at ten thirty among friends",
        # euro/pound money incl. grouped digits and singular
        "It costs €1,234": "It costs one thousand two hundred thirty four euros",
        "about €1 and £2": "about one euro and two pounds",
        # decades and the 24/7 idiom
        "born in the 1980s": "born in the nineteen eighties",
        "the 1900s and 2000s": "the nineteen hundreds and two thousands",
        "open 24/7 here": "open twenty four seven here",
        "He owns 50+ cars": "He owns fifty plus cars",
    }
    assert len(golden) >= 30, len(golden)
    for src, want in golden.items():
        assert norm.normalize(src) == want, (src, norm.normalize(src))


def test_normalizer_flags():
    from index_tts_dubbing_tpu.utils import tn
    z = tn.ZhNormalizer(remove_erhua=True, remove_interjections=True)
    assert "儿" not in z.normalize("好玩儿")
    assert z.normalize("嗯这个嘛") == "这个"
    # 儿 kept when not erhua
    assert "儿" in z.normalize("儿童节")


def test_en_ordinals_fractions():
    from index_tts_dubbing_tpu.utils import tn
    assert tn.en_ordinal(1) == "first"
    assert tn.en_ordinal(12) == "twelfth"
    assert tn.en_ordinal(20) == "twentieth"
    assert tn.en_ordinal(21) == "twenty first"
    assert tn.en_ordinal(100) == "one hundredth"
    assert tn.en_fraction(1, 2) == "one half"
    assert tn.en_fraction(3, 4) == "three quarters"
    assert tn.en_fraction(2, 5) == "two fifths"
