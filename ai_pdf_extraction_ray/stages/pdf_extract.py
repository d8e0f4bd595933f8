"""PDF layout extraction from raw bytes: content-stream parse, glyph
clustering, reading-order sort.

Deterministic pdfminer-style parser (built from the public PDF 1.7 spec
structure; no poppler/rasterization — replaces the reference's
pdf2image+vision path, reference: app/backend/services/pdf_service.py:40-128):

1. object scan: ``N 0 obj ... endobj`` pairs located lexically (no xref
   needed — tolerant of broken offsets); streams sliced between
   ``stream``/``endstream``; ``/FlateDecode`` streams inflated with zlib;
2. content-stream tokenizer: literal strings (with escapes + nested parens),
   hex strings, numbers, names, arrays, operators;
3. text-state interpreter: ``BT/ET``, ``Tf`` (font size), ``TL`` (leading),
   ``Td/TD/Tm/T*``, ``Tj/TJ/'/"`` — producing glyph runs ``(x, y, text)``.
   X-advance uses the width-table-free approximation
   ``0.5 * font_size * len(chars)`` (SURVEY.md §7.4 hard part #2);
   TJ numeric elements kern by ``-n/1000 * font_size``;
4. layout analysis: runs clustered into **lines** by y-proximity
   (|dy| <= 2pt), sorted top-to-bottom then left-to-right (reading order);
   within a line, runs sorted by x and joined, inserting a space when the
   inter-run gap exceeds ``0.2 * font_size``; consecutive lines whose
   vertical gap exceeds ``1.8 * leading`` start a new block;
5. output contract: lines within a block are reflowed with a single space
   (paragraph reconstruction); blocks joined with "\\n\\n". Deterministic:
   ties in y broken by x, then by run input order.

Magic-byte / emptiness checks mirror the reference's ingest validation
(pdf_service.py:74-87): failures become error records, never exceptions.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

from ..schema import round_confidence

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*)\n?endstream", re.DOTALL)

Y_LINE_TOL = 2.0
GAP_SPACE_FACTOR = 0.2
BLOCK_GAP_FACTOR = 1.8
X_ADVANCE_FACTOR = 0.5
PDF_CONFIDENCE = 0.9  # deterministic parse succeeded; no density signal


@dataclass
class Run:
    x: float
    y: float
    text: str
    size: float
    order: int


class _ContentLexer:
    """Tokenize a decoded content stream into strings/numbers/names/ops."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.n = len(data)

    def tokens(self):  # noqa: ANN201 — generator of (kind, value)
        d, n = self.data, self.n
        while self.pos < n:
            c = d[self.pos:self.pos + 1]
            if c in b" \t\r\n\x00":
                self.pos += 1
            elif c == b"%":  # comment to EOL
                while self.pos < n and d[self.pos:self.pos + 1] not in b"\r\n":
                    self.pos += 1
            elif c == b"(":
                yield ("str", self._lex_string())
            elif c == b"<":
                if d[self.pos:self.pos + 2] == b"<<":
                    self.pos += 2
                    yield ("op", "<<")
                else:
                    yield ("str", self._lex_hex_string())
            elif c == b">":
                if d[self.pos:self.pos + 2] == b">>":
                    self.pos += 2
                    yield ("op", ">>")
                else:
                    self.pos += 1
            elif c == b"[":
                self.pos += 1
                yield ("op", "[")
            elif c == b"]":
                self.pos += 1
                yield ("op", "]")
            elif c == b"/":
                start = self.pos + 1
                self.pos = start
                while self.pos < n and d[self.pos:self.pos + 1] not in b" \t\r\n\x00()<>[]{}/%":
                    self.pos += 1
                yield ("name", d[start:self.pos].decode("latin-1"))
            elif c in b"+-.0123456789":
                start = self.pos
                self.pos += 1
                while self.pos < n and d[self.pos:self.pos + 1] in b"+-.0123456789":
                    self.pos += 1
                try:
                    yield ("num", float(d[start:self.pos]))
                except ValueError:
                    pass
            else:
                start = self.pos
                while self.pos < n and d[self.pos:self.pos + 1] not in b" \t\r\n\x00()<>[]{}/%":
                    self.pos += 1
                if self.pos == start:
                    self.pos += 1
                else:
                    yield ("op", d[start:self.pos].decode("latin-1"))

    _ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
                b"(": "(", b")": ")", b"\\": "\\"}

    def _lex_string(self) -> str:
        d, n = self.data, self.n
        self.pos += 1  # past '('
        depth = 1
        out: list[str] = []
        while self.pos < n:
            c = d[self.pos:self.pos + 1]
            if c == b"\\":
                nxt = d[self.pos + 1:self.pos + 2]
                if nxt in self._ESCAPES:
                    out.append(self._ESCAPES[nxt])
                    self.pos += 2
                elif nxt in b"01234567":  # octal up to 3 OCTAL digits —
                    # \8 / \9 are not octal (bytes.isdigit matched them and
                    # int(_, 8) raised, demoting the whole doc to an error
                    # record; PDF spec: drop the backslash — review finding)
                    j = self.pos + 1
                    oct_digits = b""
                    while (j < n and len(oct_digits) < 3
                           and d[j:j + 1] in b"01234567"):
                        oct_digits += d[j:j + 1]
                        j += 1
                    out.append(chr(int(oct_digits, 8)))
                    self.pos = j
                elif nxt in b"\r\n":  # line continuation
                    self.pos += 2
                    if nxt == b"\r" and d[self.pos:self.pos + 1] == b"\n":
                        self.pos += 1
                else:
                    self.pos += 2
                    out.append(nxt.decode("latin-1"))
            elif c == b"(":
                depth += 1
                out.append("(")
                self.pos += 1
            elif c == b")":
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(")")
            else:
                out.append(c.decode("latin-1"))
                self.pos += 1
        return "".join(out)

    def _lex_hex_string(self) -> str:
        d, n = self.data, self.n
        self.pos += 1  # past '<'
        hexd: list[str] = []
        while self.pos < n and d[self.pos:self.pos + 1] != b">":
            ch = d[self.pos:self.pos + 1]
            if ch in b"0123456789abcdefABCDEF":
                hexd.append(ch.decode())
            self.pos += 1
        self.pos += 1
        if len(hexd) % 2:
            hexd.append("0")
        raw = bytes.fromhex("".join(hexd))
        return raw.decode("latin-1")


def _decode_streams(payload: bytes) -> list[bytes]:
    """All stream payloads, Flate-inflated when applicable."""
    out: list[bytes] = []
    for m in _OBJ_RE.finditer(payload):
        body = m.group(2)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        data = sm.group(1)
        head = body[:sm.start()]
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                try:  # stray trailing newline inside the slice
                    data = zlib.decompress(data.rstrip(b"\r\n"))
                except zlib.error:
                    continue
        out.append(data)
    return out


def _interpret(content: bytes, order_base: int) -> list[Run]:
    """Run the text-op subset; emit positioned glyph runs."""
    runs: list[Run] = []
    lexer = _ContentLexer(content)
    stack: list = []
    font_size = 12.0
    leading = 0.0
    # line matrix origin (tx, ty) and cursor x offset within the line
    lx = ly = 0.0
    cx = 0.0
    in_text = False
    order = order_base

    def emit(s: str) -> None:
        nonlocal cx, order
        if s:
            runs.append(Run(lx + cx, ly, s, font_size, order))
            order += 1
            cx += X_ADVANCE_FACTOR * font_size * len(s)

    def newline() -> None:
        nonlocal ly, cx
        ly -= leading if leading else 1.2 * font_size
        cx = 0.0

    tokens = lexer.tokens()
    for kind, val in tokens:
        if kind in ("str", "num", "name"):
            stack.append((kind, val))
            continue
        op = val
        if op == "BT":
            in_text, lx, ly, cx = True, 0.0, 0.0, 0.0
        elif op == "ET":
            in_text = False
        elif op == "Tf":
            if stack and stack[-1][0] == "num":
                font_size = float(stack[-1][1])
        elif op == "TL":
            if stack and stack[-1][0] == "num":
                leading = float(stack[-1][1])
        elif op in ("Td", "TD"):
            nums = [v for k, v in stack if k == "num"][-2:]
            if len(nums) == 2:
                lx += nums[0]
                ly += nums[1]
                cx = 0.0
                if op == "TD":
                    leading = -nums[1]
        elif op == "Tm":
            nums = [v for k, v in stack if k == "num"][-6:]
            if len(nums) == 6:
                lx, ly = nums[4], nums[5]
                cx = 0.0
        elif op == "T*":
            newline()
        elif op == "Tj":
            if in_text and stack and stack[-1][0] == "str":
                emit(stack[-1][1])
        elif op == "'":
            if in_text and stack and stack[-1][0] == "str":
                newline()
                emit(stack[-1][1])
        elif op == '"':
            if in_text and stack and stack[-1][0] == "str":
                newline()
                emit(stack[-1][1])
        elif op == "[":
            stack.append(("op", "["))
            continue
        elif op == "]":
            # TJ array: gather back to matching '['
            arr: list = []
            while stack and stack[-1] != ("op", "["):
                arr.append(stack.pop())
            if stack:
                stack.pop()
            stack.append(("arr", list(reversed(arr))))
            continue
        elif op == "TJ":
            if in_text and stack and stack[-1][0] == "arr":
                for k, v in stack[-1][1]:
                    if k == "str":
                        emit(v)
                    elif k == "num":
                        cx -= v / 1000.0 * font_size
        if op not in ("[",):
            stack.clear()
    return runs


COLUMN_GAP_MIN = 36.0  # half an inch of whitespace between column x-bands


def _detect_columns(runs: list[Run]) -> list[list[Run]]:
    """Column detection for reading order: project runs onto x, split at
    gaps wider than COLUMN_GAP_MIN between occupied x-bands, and return
    runs grouped per column left-to-right. One column => [runs].

    A run's band is [x, x + estimated width]. Deterministic: band edges
    come from the same width approximation the interpreter uses.
    """
    if len(runs) < 4:
        return [runs]
    bands = sorted(
        (r.x, r.x + X_ADVANCE_FACTOR * r.size * len(r.text)) for r in runs
    )
    # merge overlapping bands, track gaps
    merged: list[list[float]] = [list(bands[0])]
    for lo, hi in bands[1:]:
        if lo <= merged[-1][1] + COLUMN_GAP_MIN:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if len(merged) < 2:
        return [runs]
    cols: list[list[Run]] = [[] for _ in merged]
    for r in runs:
        for ci, (lo, hi) in enumerate(merged):
            if lo <= r.x <= hi:
                cols[ci].append(r)
                break
    return [c for c in cols if c]


def _assemble(runs: list[Run]) -> str:
    """Lines by y-cluster (top-down), x-sort within; blocks by leading gaps.
    Multi-column pages are read column-by-column, left to right (reading
    order per the north star's layout analysis)."""
    if not runs:
        return ""
    columns = _detect_columns(runs)
    if len(columns) > 1:
        return "\n\n".join(_assemble_single(c) for c in columns)
    return _assemble_single(runs)


def _assemble_single(runs: list[Run]) -> str:
    srt = sorted(runs, key=lambda r: (-r.y, r.x, r.order))
    lines: list[list[Run]] = []
    for r in srt:
        if lines and abs(lines[-1][0].y - r.y) <= Y_LINE_TOL:
            lines[-1].append(r)
        else:
            lines.append([r])

    line_texts: list[str] = []
    line_ys: list[float] = []
    line_sizes: list[float] = []
    for line in lines:
        line.sort(key=lambda r: (r.x, r.order))
        parts: list[str] = []
        prev_end = None
        for r in line:
            if prev_end is not None and r.x - prev_end > GAP_SPACE_FACTOR * r.size:
                parts.append(" ")
            parts.append(r.text)
            prev_end = r.x + X_ADVANCE_FACTOR * r.size * len(r.text)
        line_texts.append("".join(parts))
        line_ys.append(line[0].y)
        line_sizes.append(line[0].size)

    blocks: list[list[str]] = [[line_texts[0]]]
    for i in range(1, len(line_texts)):
        gap = line_ys[i - 1] - line_ys[i]
        max_gap = BLOCK_GAP_FACTOR * max(LEADING_FALLBACK, 1.2 * line_sizes[i])
        if gap > max_gap:
            blocks.append([line_texts[i]])
        else:
            blocks[-1].append(line_texts[i])
    return "\n\n".join(" ".join(b) for b in blocks)


LEADING_FALLBACK = 14.0


def extract_pdf(
    payload: bytes,
    first_page: int | None = None,
    last_page: int | None = None,
) -> dict:
    """One PDF payload -> extraction record (failure-is-data, never raises).

    Pages are assembled independently (each content stream is one page) and
    joined with "\\n\\n" in document order — y coordinates are per-page, so
    cross-page interleaving by y would scramble reading order.
    ``first_page``/``last_page`` (1-based, inclusive) mirror the reference's
    page-range semantics (pdf_service.py:40-107 convert range args).
    """
    try:
        if not payload:
            return _error_record("empty payload")
        if not payload.startswith(b"%PDF"):
            return _error_record("not a PDF (missing %PDF magic)")
        page_streams = [s for s in _decode_streams(payload) if b"BT" in s]
        lo = 1 if first_page is None else max(1, first_page)
        hi = len(page_streams) if last_page is None else min(len(page_streams), last_page)
        page_texts: list[str] = []
        order_base = 0
        for stream in page_streams[lo - 1:hi]:
            runs = _interpret(stream, order_base=order_base)
            order_base += len(runs)
            t = _assemble(runs)
            if t:
                page_texts.append(t)
        text = "\n\n".join(page_texts)
        if not text:
            return {
                "text": "", "spans": [], "confidence": 0.0, "n_blocks": 0,
                "warnings": ["no text operators found"], "error": None,
                "flat_text": "",
            }
        n_blocks = text.count("\n\n") + 1
        spans = []
        pos = 0
        for i, part in enumerate(text.split("\n\n")):
            spans.append({"field": f"block_{i}", "start": pos, "end": pos + len(part)})
            pos += len(part) + 2
        return {
            "text": text, "spans": spans,
            "confidence": round_confidence(PDF_CONFIDENCE),
            "n_blocks": n_blocks, "warnings": [], "error": None,
            "flat_text": text,
        }
    except Exception as e:  # noqa: BLE001
        return _error_record(f"pdf parse error: {e}")


def _error_record(msg: str) -> dict:
    return {
        "text": None, "spans": [], "confidence": 0.0, "n_blocks": 0,
        "warnings": [], "error": msg, "flat_text": "",
    }


def page_count(payload: bytes) -> int:
    """Count /Type /Page objects (reference get_page_count,
    pdf_service.py:148-179, via pdfinfo — here a lexical count).
    Negative lookahead, not ``[^s]``: a char class CONSUMES a byte, so
    '/Type /Page' at end-of-buffer went uncounted (review finding)."""
    return len(re.findall(rb"/Type\s*/Page(?!s)", payload))
