"""Plain-text parser: sentence segmentation → zero-timestamp SRT entries
(spec: srt_dubbing/src/txt_parser.py, pysbd replaced by a self-contained
splitter)."""
from __future__ import annotations

import re
from pathlib import Path
from typing import List

from index_tts_dubbing_tpu.dubbing.srt_parser import SRTEntry

_SENT_SPLIT = re.compile(
    r"(?<=[.!?。！？；;])(?![.!?。！？\"'”’)\]])\s*")


def split_sentences(text: str) -> List[str]:
    parts = [p.strip() for p in _SENT_SPLIT.split(text)]
    return [p for p in parts if p]


class TXTParser:
    def parse_file(self, file_path: str) -> List[SRTEntry]:
        p = Path(file_path)
        if not p.exists():
            raise FileNotFoundError(f"TXT file not found: {file_path}")
        try:
            content = p.read_text(encoding="utf-8")
        except UnicodeDecodeError:
            content = p.read_text(encoding="gbk")
        return self.parse_content(content)

    def parse_content(self, content: str) -> List[SRTEntry]:
        sentences = split_sentences(content.replace("\n", " "))
        return [SRTEntry(index=i + 1, start_time=0.0, end_time=0.0, text=s)
                for i, s in enumerate(sentences)]
