"""Build the full hanzi -> tone-numbered-pinyin table asset.

The reference resolves readings with pypinyin (/root/reference/text/chinese.py:4,
:79-184); that package is not in this image, so we derive an equivalently
complete single-character table from data that IS here:

1. /usr/share/perl/5.36.0/Unicode/Collate/CJK/{Pinyin,Zhuyin}.pm — the CLDR
   pinyin/zhuyin collation tables (Unicode license). Each DATA section lists
   all ~21k Han characters in reading order, wrapped at 10 characters per
   line; a line shorter than 10 closes a same-reading group. The actual
   reading strings are NOT in the files — only the grouping and ordering.
2. The hand-curated lexicon (text/mandarin_lexicon.py) anchors groups: every
   character in a group shares the group's reading, so one known member
   labels the whole group.
3. tools/zh_pinyin_fill.py — curated readings for groups with no anchor
   (written by inspecting the member characters; linguistic facts, not code).

Cross-checks applied:
- classes are the INTERSECTION of pinyin-run and zhuyin-run membership, so an
  over-merged run in one file (a reading group of exactly 10*k characters
  leaves no short terminator line) is split by the other file's boundaries;
- tone-adjacent merges that survive in both files are auto-split at the line
  boundary that separates the anchor votes;
- the final table must be non-decreasing in (syllable, tone) along the CLDR
  pinyin order within each initial-letter section (straggler groups appended
  at section ends are whitelisted), which catches wrong fills mechanically.

Output: bert_vits2_tpu/text/assets/zh_pinyin.tsv.gz with "char reading"
lines. The runtime lookup order stays: WORD_PINYIN (polyphone words) >
hand lexicon > this table.
"""

from __future__ import annotations

import gzip
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CJK = "/usr/share/perl/5.36.0/Unicode/Collate/CJK"

TONES = "12345"


def parse_lines(path):
    """-> list of (section_letter, [chars]) per DATA line."""
    out, letter, started = [], None, False
    for raw in open(path):
        s = raw.strip()
        if s == "__DATA__":
            started = True
            continue
        if not started or not s:
            continue
        if s == "__END__":
            break
        toks = s.split()
        if not all(re.fullmatch(r"(FDD0-)?[0-9A-F]{4,5}", t) for t in toks):
            continue
        if toks[0].startswith("FDD0-"):
            letter = chr(int(toks[0].split("-")[1], 16))
            toks = toks[1:]
        chars = [chr(int(t, 16)) for t in toks]
        if chars:
            out.append((letter, chars))
    return out


def runs_of(lines):
    """Merge wrapped lines into reading runs: a run continues while lines
    have exactly 10 chars; a short line closes it. Returns
    [(letter, [line_chars...])] keeping line structure (split candidates)."""
    runs, cur, cur_letter = [], [], None
    for letter, chars in lines:
        if cur and letter != cur_letter:
            runs.append((cur_letter, cur))
            cur = []
        cur_letter = letter
        cur.append(chars)
        if len(chars) < 10:
            runs.append((cur_letter, cur))
            cur = []
    if cur:
        runs.append((cur_letter, cur))
    return runs


def build_classes():
    """-> ordered list of class dicts with keys:
    letter, chars (pinyin order), lines (pinyin line structure),
    pin_run, zhu_run."""
    pin_runs = runs_of(parse_lines(f"{CJK}/Pinyin.pm"))
    zhu_runs = runs_of(parse_lines(f"{CJK}/Zhuyin.pm"))

    zhu_of = {}
    for zi, (_, linelist) in enumerate(zhu_runs):
        for chars in linelist:
            for c in chars:
                zhu_of[c] = zi

    classes = []
    for pi, (letter, linelist) in enumerate(pin_runs):
        # split the pinyin run by zhuyin-run membership (order-preserving;
        # a reading class is contiguous in both orders)
        cur_key, cur_chars, cur_lines = None, [], []
        for li, chars in enumerate(linelist):
            for c in chars:
                key = zhu_of.get(c, -1)
                if key != cur_key and cur_chars:
                    classes.append(dict(letter=letter, chars=cur_chars,
                                        lines=list(cur_lines), pin_run=pi,
                                        zhu_run=cur_key))
                    cur_chars, cur_lines = [], []
                cur_key = key
                cur_chars.append(c)
                if not cur_lines or cur_lines[-1][0] != li:
                    cur_lines.append((li, []))
                cur_lines[-1][1].append(c)
        if cur_chars:
            classes.append(dict(letter=letter, chars=cur_chars,
                                lines=list(cur_lines), pin_run=pi,
                                zhu_run=cur_key))
    return classes


def anchor_votes(chars, lexicon):
    votes = {}
    for c in chars:
        r = lexicon.get(c)
        if r:
            votes.setdefault(r, []).append(c)
    return votes


def syllable_tone(reading):
    """Sort key matching CLDR pinyin collation: ü is u + a secondary
    difference (lu1..lu4 < lv2..lv4 < luan2), tones 1-4 then the
    neutral/multi bucket."""
    m = re.fullmatch(r"([a-z]+)([1-5])", reading)
    if not m:
        return (reading, 0, 0)
    syl, tone = m.group(1), int(m.group(2))
    return (syl.replace("v", "u"), int("v" in syl), tone)


def try_autosplit(cls, votes):
    """Tone-adjacent over-merge surviving in both files: split at the line
    boundary that perfectly separates the anchor votes (reading groups are
    contiguous, and a hidden boundary can only sit at a 10-char line end)."""
    if len(votes) != 2:
        return None
    (r1, c1), (r2, c2) = sorted(votes.items(),
                                key=lambda kv: cls["chars"].index(kv[1][0]))
    pos = {c: i for i, c in enumerate(cls["chars"])}
    if max(pos[c] for c in c1) > min(pos[c] for c in c2):
        return None  # interleaved: genuine multi-reading chars, not a merge
    # candidate split points: line boundaries between the two vote blocks
    lo = max(pos[c] for c in c1)
    hi = min(pos[c] for c in c2)
    boundaries = []
    n = 0
    for _, linechars in cls["lines"]:
        n += len(linechars)
        if lo < n <= hi:
            boundaries.append(n)
    if len(boundaries) != 1:
        return None  # ambiguous
    b = boundaries[0]
    return [(r1, cls["chars"][:b]), (r2, cls["chars"][b:])]


def load_fill():
    try:
        from zh_pinyin_fill import FILL, STRAGGLERS  # tools/zh_pinyin_fill.py
    except ImportError:
        FILL, STRAGGLERS = {}, set()
    return FILL, STRAGGLERS


def main(write=True, verbose=False):
    from bert_vits2_tpu.text.mandarin_lexicon import CHAR_PINYIN

    classes = build_classes()
    fill, stragglers = load_fill()

    def spans_from(cls, r):
        """Split fill {first_char_of_span: reading} -> [(reading, chars)].
        Must cover the class head so every member lands in a span."""
        firsts = sorted((cls["chars"].index(f), rr) for f, rr in r.items())
        if firsts[0][0] != 0:
            raise ValueError(
                f"split fill for {cls['chars'][0]!r} must start at class "
                "head")
        out = []
        for j, (i, rr) in enumerate(firsts):
            end = (firsts[j + 1][0] if j + 1 < len(firsts)
                   else len(cls["chars"]))
            out.append((rr, cls["chars"][i:end]))
        return out

    resolved = []  # (letter, reading|None, chars, source, head)
    for cls in classes:
        votes = anchor_votes(cls["chars"], CHAR_PINYIN)
        key = cls["chars"][0]
        L = cls["letter"]
        if key in fill:
            # curated fill wins over anchors AND autosplit: it encodes a
            # human look at the full member list (anchor majorities can be
            # wrong for multi-reading buckets)
            r = fill[key]
            if isinstance(r, dict):
                for rr, chs in spans_from(cls, r):
                    resolved.append((L, rr, chs, "fill", key))
            else:
                resolved.append((L, r, cls["chars"], "fill", key))
        elif len(votes) == 1:
            resolved.append((L, next(iter(votes)), cls["chars"], "anchor",
                             key))
        elif len(votes) > 1:
            split = try_autosplit(cls, votes)
            if split:
                for r, chs in split:
                    resolved.append((L, r, chs, "autosplit", key))
            else:
                best = max(votes, key=lambda k: len(votes[k]))
                resolved.append((L, best, cls["chars"], "majority", key))
        else:
            resolved.append((L, None, cls["chars"], "todo", key))

    # ---- order validation ----
    violations = []
    prev = None
    for letter, reading, chars, src, head in resolved:
        if reading is None:
            continue
        if head in stragglers:
            # multi-reading buckets / section-end stragglers: CLDR appends
            # them out of alphabetical position by design
            continue
        st = syllable_tone(reading)
        if not reading.startswith(letter.lower()):
            violations.append(("letter", letter, reading, "".join(chars[:6]),
                               src))
            continue
        if prev is not None and prev[0] == letter and st < prev[1]:
            violations.append(("order", f"{prev[2]}->{reading}",
                               reading, "".join(chars[:6]), src))
        prev = (letter, st, reading)

    n_todo = sum(1 for x in resolved if x[1] is None)
    print(f"classes={len(classes)} resolved={len(resolved) - n_todo} "
          f"todo={n_todo} order_violations={len(violations)}",
          file=sys.stderr)
    if verbose:
        for v in violations:
            print("VIOLATION", v, file=sys.stderr)

    if write:
        table = {}
        for letter, reading, chars, src, head in resolved:
            if reading is None:
                continue
            for c in chars:
                table.setdefault(c, reading)
        path = os.path.join(REPO, "bert_vits2_tpu", "text", "assets",
                            "zh_pinyin.tsv.gz")
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write("# hanzi<TAB>tone-numbered pinyin; derived from CLDR "
                    "collation grouping + curated anchors (see "
                    "tools/build_zh_pinyin_table.py)\n")
            for c in sorted(table):
                f.write(f"{c}\t{table[c]}\n")
        print(f"wrote {path}: {len(table)} chars", file=sys.stderr)
    return resolved, violations


if __name__ == "__main__":
    main(write="--write" in sys.argv, verbose="-v" in sys.argv)
