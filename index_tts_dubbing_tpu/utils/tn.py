"""Self-contained zh/en text normalization (number/date/time/unit reading).

Fills the role of WeTextProcessing / wetext in the reference
(utils/front.py:88-111): non-standard words → speakable words. Implemented
from scratch as rule pipelines; when the optional WeTextProcessing package is
present it is preferred (same graceful ladder as the reference).
"""
from __future__ import annotations

import re
from typing import Callable, List, Tuple

# ---------------------------------------------------------------------------
# Chinese number reading
# ---------------------------------------------------------------------------

ZH_DIGITS = "零一二三四五六七八九"
ZH_UNITS = ["", "十", "百", "千"]
ZH_GROUPS = ["", "万", "亿", "万亿"]


def zh_digits(s: str) -> str:
    """Digit-by-digit reading (phone numbers, years). '203'→'二零三'."""
    return "".join(ZH_DIGITS[int(c)] if c.isdigit() else c for c in s)


def _zh_int_group(n: int) -> str:
    """Read 0 < n < 10000."""
    out = []
    started = False
    zero_pending = False
    for i, unit in enumerate(reversed(ZH_UNITS)):
        power = 10 ** (3 - i)
        d = (n // power) % 10
        if d == 0:
            if started:
                zero_pending = True
            continue
        if zero_pending:
            out.append("零")
            zero_pending = False
        out.append(ZH_DIGITS[d] + unit)
        started = True
    return "".join(out)


def zh_int(n: int) -> str:
    if n == 0:
        return "零"
    if n < 0:
        return "负" + zh_int(-n)
    groups: List[int] = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    out: List[str] = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            continue
        txt = _zh_int_group(g)
        if gi < len(groups) - 1 and g < 1000 and out:
            out.append("零")
        out.append(txt + ZH_GROUPS[gi])
    s = "".join(out)
    # idiomatic: 一十X → 十X at the very start
    if s.startswith("一十"):
        s = s[1:]
    s = s.replace("零零", "零")
    return s


def zh_number(s: str) -> str:
    """Read a decimal number string in Chinese."""
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "." in s:
        a, b = s.split(".", 1)
        txt = (zh_int(int(a)) if a else "零") + "点" + zh_digits(b)
    else:
        txt = zh_int(int(s))
    return ("负" if neg else "") + txt


# ---------------------------------------------------------------------------
# English number reading
# ---------------------------------------------------------------------------

EN_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
           "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
           "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
EN_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
           "eighty", "ninety"]
EN_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand"),
            (100, "hundred")]


def en_int(n: int) -> str:
    if n < 0:
        return "minus " + en_int(-n)
    if n < 20:
        return EN_ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return EN_TENS[t] + ("" if r == 0 else " " + EN_ONES[r])
    for scale, name in EN_SCALE:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = en_int(head) + " " + name
            if rest:
                out += " " + en_int(rest)
            return out
    return EN_ONES[0]


def en_digits(s: str) -> str:
    return " ".join(EN_ONES[int(c)] if c.isdigit() else c for c in s)


def en_number(s: str) -> str:
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "." in s:
        a, b = s.split(".", 1)
        txt = (en_int(int(a)) if a else "zero") + " point " + en_digits(b)
    else:
        txt = en_int(int(s))
    return ("minus " if neg else "") + txt


def en_year(n: int) -> str:
    """2002 → 'twenty oh two', 1999 → 'nineteen ninety nine'."""
    if 1000 <= n <= 9999:
        hi, lo = divmod(n, 100)
        if lo == 0:
            return en_int(hi) + " hundred"
        if lo < 10:
            return en_int(hi) + " oh " + en_int(lo)
        return en_int(hi) + " " + en_int(lo)
    return en_int(n)


# ---------------------------------------------------------------------------
# Rule pipelines
# ---------------------------------------------------------------------------

_NUM = r"\d+(?:\.\d+)?"


class ZhNormalizer:
    """Chinese text normalizer: NSW → speakable Chinese."""

    def __init__(self, remove_erhua: bool = False, remove_interjections: bool = False):
        n = _NUM
        self.rules: List[Tuple[re.Pattern, Callable[[re.Match], str]]] = [
            # dates
            (re.compile(r"(\d{4})[/\-年](\d{1,2})[/\-月](\d{1,2})日?"),
             lambda m: f"{zh_digits(m.group(1))}年{zh_int(int(m.group(2)))}月{zh_int(int(m.group(3)))}日"),
            (re.compile(r"(\d{4})\s*年"), lambda m: zh_digits(m.group(1)) + "年"),
            (re.compile(r"(\d{1,2})\s*月(\d{1,2})\s*日"),
             lambda m: f"{zh_int(int(m.group(1)))}月{zh_int(int(m.group(2)))}日"),
            # time HH:MM(:SS)
            (re.compile(r"(\d{1,2}):(\d{2}):(\d{2})"),
             lambda m: f"{zh_int(int(m.group(1)))}点{zh_int(int(m.group(2)))}分{zh_int(int(m.group(3)))}秒"),
            (re.compile(r"(\d{1,2}):(\d{2})"),
             lambda m: f"{zh_int(int(m.group(1)))}点"
             + ("" if int(m.group(2)) == 0 else
                ("零" + zh_int(int(m.group(2))) if int(m.group(2)) < 10
                 else zh_int(int(m.group(2)))) + "分")),
            # phone-like digit runs with separators
            (re.compile(r"\d{3,}(?:-\d{3,})+"),
             lambda m: zh_digits(m.group(0).replace("-", ""))),
            # money
            (re.compile(rf"[¥￥]\s*({n})"), lambda m: zh_number(m.group(1)) + "元"),
            (re.compile(rf"\$\s*({n})"), lambda m: zh_number(m.group(1)) + "美元"),
            # percent / ranges / units
            (re.compile(rf"({n})\s*%"), lambda m: "百分之" + zh_number(m.group(1))),
            (re.compile(rf"({n})\s*km/h"), lambda m: zh_number(m.group(1)) + "千米每小时"),
            (re.compile(rf"({n})\s*kg"), lambda m: zh_number(m.group(1)) + "千克"),
            (re.compile(rf"({n})\s*km"), lambda m: zh_number(m.group(1)) + "千米"),
            (re.compile(rf"({n})[~\-—]({n})"),
             lambda m: zh_number(m.group(1)) + "到" + zh_number(m.group(2))),
            (re.compile(rf"({n})\s*\+"), lambda m: zh_number(m.group(1)) + "多"),
            # bare numbers
            (re.compile(n), lambda m: zh_number(m.group(0))),
        ]

    def normalize(self, text: str) -> str:
        for pat, fn in self.rules:
            text = pat.sub(fn, text)
        return text


class EnNormalizer:
    """English text normalizer: NSW → speakable English."""

    def __init__(self):
        n = _NUM
        self.rules: List[Tuple[re.Pattern, Callable[[re.Match], str]]] = [
            # time
            (re.compile(r"(\d{1,2}):00\s*(AM|PM|am|pm)?"),
             lambda m: en_int(int(m.group(1))) + " o'clock"
             + (f" {' '.join(m.group(2).upper())}" if m.group(2) else "")),
            (re.compile(r"(\d{1,2}):(\d{2})\s*(AM|PM|am|pm)?"),
             lambda m: en_int(int(m.group(1))) + " " + en_int(int(m.group(2)))
             + (f" {' '.join(m.group(3).upper())}" if m.group(3) else "")),
            # money
            (re.compile(rf"\$\s*({n})"),
             lambda m: en_number(m.group(1)) + " dollars"
             if m.group(1) not in ("1", "1.0") else "one dollar"),
            (re.compile(rf"({n})\s*%"), lambda m: en_number(m.group(1)) + " percent"),
            # years
            (re.compile(r"\b(1[0-9]{3}|20[0-9]{2})\b"),
             lambda m: en_year(int(m.group(0)))),
            # bare numbers
            (re.compile(n), lambda m: en_number(m.group(0))),
        ]

    def normalize(self, text: str) -> str:
        for pat, fn in self.rules:
            text = pat.sub(fn, text)
        return text
