"""SRT / WebVTT subtitle parsing — the caption tier of a video
training-data pipeline (caption-audio alignment, caption quality
filters, per-cue text extraction all start here).

Both formats are line-oriented text: SRT blocks are ``index /
HH:MM:SS,mmm --> HH:MM:SS,mmm / text...`` separated by blank lines;
WebVTT opens with a ``WEBVTT`` header, uses ``.`` for the millisecond
separator, allows an optional cue identifier line and ``NOTE``
comment blocks, and permits ``MM:SS.mmm`` timestamps without the
hour field.  Cues parse to integer milliseconds — no float drift.

Pure functions over ``str``; the Spark stage that explodes payload
columns into cue rows is ``operators/multimodal.py::subtitle_cues``.
"""

from __future__ import annotations

import re

_SRT_TS = re.compile(
    r"^(\d+):(\d{1,2}):(\d{1,2}),(\d{1,3})$"
)
_VTT_TS = re.compile(
    r"^(?:(\d+):)?(\d{1,2}):(\d{1,2})\.(\d{1,3})$"
)
_ARROW = "-->"


def _ts_ms(tok: str, pattern: re.Pattern, origin: str) -> int:
    m = pattern.match(tok.strip())
    if not m:
        raise ValueError(f"{origin!r}: bad timestamp {tok.strip()!r}")
    hh, mm, ss, ms = (int(g) if g else 0 for g in m.groups())
    if mm > 59 or ss > 59:
        raise ValueError(f"{origin!r}: timestamp out of range {tok!r}")
    return ((hh * 60 + mm) * 60 + ss) * 1000 + ms


def _cue_ms(line: str, pattern: re.Pattern, origin: str):
    lo, _, hi = line.partition(_ARROW)
    # VTT allows positioning settings after the end timestamp
    hi = hi.strip().split(" ", 1)[0]
    start = _ts_ms(lo, pattern, origin)
    end = _ts_ms(hi, pattern, origin)
    if end < start:
        raise ValueError(
            f"{origin!r}: cue ends before it starts ({line.strip()!r})"
        )
    return start, end


def parse_srt(text: str, origin: str = "<text>") -> list[dict]:
    """SRT cues: ``[{cue_idx, start_ms, end_ms, text}, ...]`` in
    stream order.  ``cue_idx`` is the declared counter; malformed
    timing lines raise ValueError."""
    cues = []
    for block in re.split(r"\r?\n\r?\n+", text.strip("﻿ \r\n")):
        lines = [
            ln.rstrip("\r") for ln in block.split("\n") if ln.strip()
        ]
        if not lines:
            continue
        if _ARROW not in "".join(lines[:2]):
            raise ValueError(
                f"{origin!r}: SRT block without a timing line: "
                f"{lines[0][:40]!r}"
            )
        if _ARROW in lines[0]:
            idx, timing, body = len(cues) + 1, lines[0], lines[1:]
        else:
            if not lines[0].strip().isdigit():
                raise ValueError(
                    f"{origin!r}: bad SRT cue counter {lines[0][:20]!r}"
                )
            idx, timing, body = int(lines[0]), lines[1], lines[2:]
        start, end = _cue_ms(timing, _SRT_TS, origin)
        cues.append(
            {
                "cue_idx": idx,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(body).strip(),
            }
        )
    return cues


def parse_vtt(text: str, origin: str = "<text>") -> list[dict]:
    """WebVTT cues with the same shape as :func:`parse_srt`
    (``cue_idx`` is the 1-based stream position; identifier lines and
    NOTE/STYLE blocks are skipped per spec)."""
    body = text.lstrip("﻿")
    if not body.startswith("WEBVTT"):
        raise ValueError(f"{origin!r}: missing WEBVTT header")
    blocks = re.split(r"\r?\n\r?\n+", body.strip())[1:]
    cues = []
    for block in blocks:
        lines = [ln.rstrip("\r") for ln in block.split("\n") if ln.strip()]
        if not lines or lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        if _ARROW in lines[0]:
            timing, body_lines = lines[0], lines[1:]
        elif len(lines) > 1 and _ARROW in lines[1]:
            timing, body_lines = lines[1], lines[2:]  # identifier line
        else:
            raise ValueError(
                f"{origin!r}: VTT block without a timing line: "
                f"{lines[0][:40]!r}"
            )
        start, end = _cue_ms(timing, _VTT_TS, origin)
        cues.append(
            {
                "cue_idx": len(cues) + 1,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(body_lines).strip(),
            }
        )
    return cues


def _fmt_ts(ms: int, sep: str) -> str:
    hh, rem = divmod(ms, 3_600_000)
    mm, rem = divmod(rem, 60_000)
    ss, mmm = divmod(rem, 1000)
    return f"{hh:02d}:{mm:02d}:{ss:02d}{sep}{mmm:03d}"


def make_srt(cues: list[dict]) -> str:
    """Serialize cues (dicts with start_ms/end_ms/text) as SRT."""
    out = []
    for i, c in enumerate(cues):
        out.append(
            f"{c.get('cue_idx', i + 1)}\n"
            f"{_fmt_ts(c['start_ms'], ',')} {_ARROW} "
            f"{_fmt_ts(c['end_ms'], ',')}\n"
            f"{c.get('text', '')}"
        )
    return "\n\n".join(out) + "\n"


def make_vtt(cues: list[dict]) -> str:
    """Serialize cues as WebVTT."""
    out = ["WEBVTT"]
    for c in cues:
        out.append(
            f"{_fmt_ts(c['start_ms'], '.')} {_ARROW} "
            f"{_fmt_ts(c['end_ms'], '.')}\n"
            f"{c.get('text', '')}"
        )
    return "\n\n".join(out) + "\n"
