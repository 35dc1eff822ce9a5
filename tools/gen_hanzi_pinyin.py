#!/usr/bin/env python3
"""Generate an extended hanzi->pinyin table by anchor interpolation.

Inputs (both on-box, public, license-clean):
  * glibc locale data /usr/share/i18n/locales/iso14651_t1_pinyin —
    all CJK chars in (pinyin syllable, tone) collation order, each line's
    trailing comment carrying the char and a corpus frequency count.
    The FSF explicitly disclaims copyright interest in glibc locale data
    (file header).
  * Perl 5 core module Unicode::Collate::CJK::Pinyin — the same order
    partitioned by FDD0-00XX markers into pinyin INITIAL-LETTER buckets.
  * The curated ~741-char table already in CleanText.scala (verified by
    golden specs) as syllable ANCHORS.
  * tools/hanzi_anchor_additions.tsv — hand-curated dominant readings
    for the highest-frequency chars the base anchors leave uncovered
    (standard Hanyu Pinyin: public, uncopyrightable facts). Every line
    is VALIDATED here before use — see validate_additions().

Method: walk the glibc order; whenever two consecutive anchors carry the
SAME syllable, every char between them must also read as that syllable
(collation is sorted by syllable, then tone). Cross-check each extracted
char's syllable initial against its Perl letter bucket; discard on
mismatch. Emit tab-separated `char\tPinyin` lines sorted by codepoint.

Addition validation (a wrong reading cannot slip in silently):
  1. the char must exist in the glibc collation order and its Perl
     letter bucket must equal the reading's initial letter;
  2. after merging, the full anchor sequence in glibc order must stay
     nondecreasing by syllable — a wrong reading breaks monotonicity
     against its codepoint's collation position and the addition is
     rejected loudly (curated Scala anchors are never rejected; they
     are the trust root, pinned by golden specs).
Rejected lines are reported and dropped; accepted lines become both
interpolation anchors and direct snapshot entries. One pass reaches
closure: interpolated chars sit strictly between same-syllable anchors,
so re-anchoring on them can never widen a segment.
"""
import re, sys, unicodedata

GLIBC = "/usr/share/i18n/locales/iso14651_t1_pinyin"
PERL  = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
SCALA = "/root/repo/src/main/scala/graft/text/CleanText.scala"
ADDS  = "/root/repo/tools/hanzi_anchor_additions.tsv"

# 1. ordered (char, freq) from glibc
order = []
for line in open(GLIBC, encoding="utf-8"):
    m = re.match(r"<U([0-9A-F]{4,5})> .*#(.)(\d+)$", line.strip())
    if m:
        cp = int(m.group(1), 16)
        ch = chr(cp)
        assert ch == m.group(2), (hex(cp), m.group(2))
        order.append((ch, int(m.group(3))))
print(f"glibc ordered chars: {len(order)}", file=sys.stderr)

# 2. initial-letter bucket from Perl
letter = {}
cur = None
in_data = False
for line in open(PERL, encoding="utf-8"):
    line = line.strip()
    if line == "__DATA__": in_data = True; continue
    if not in_data: continue
    if line == "__END__": break
    m = re.match(r"FDD0-00([0-9A-F]{2})$", line)
    if m:
        cur = chr(int(m.group(1), 16)).lower()
        continue
    for tok in line.split():
        if "-" in tok: continue
        letter[chr(int(tok, 16))] = cur
print(f"perl letter buckets: {len(letter)}", file=sys.stderr)

# 3. anchors from the curated Scala table (hanzi only).
# Excluded: polyphones whose glibc collation position is a DIFFERENT
# valid reading than the curated dominant one (曾=céng, 行=háng, 落=lào,
# 什=shí, 弹=tán there) — keeping them would contaminate the segments
# they bracket. 暖/女 is a false positive (ü sorts after u; the curated
# toneless table writes both as "nu") but excluding 暖 is harmless.
EXCLUDE = set("曾行落暖什弹")
anchors = {}
src = open(SCALA, encoding="utf-8").read()
for ch, py in re.findall(r"'(.)' -> \"([A-Za-z]+) \"", src):
    if 0x4E00 <= ord(ch) <= 0x9FFF and ch not in EXCLUDE:
        anchors[ch] = py.lower()
print(f"scala anchors: {len(anchors)}", file=sys.stderr)

# Order predicate. Toneless pinyin compares lexicographically exactly as
# glibc collation orders syllables, with ONE systematic exception: ü is
# written as plain u, and ü-syllables sort AFTER every u-extension
# (lu < luan < luo < lü), so a written "lu" may legitimately follow
# "luo". That shape is always `earlier.startswith(later)`; tolerate it.
def violates(earlier, later):
    return earlier > later and not earlier.startswith(later)

# sanity: anchor order must be nondecreasing by syllable where anchors
# appear in glibc order (catches bad anchor readings)
seq = [(ch, anchors[ch]) for ch, _ in order if ch in anchors]
bad = [(a, b) for a, b in zip(seq, seq[1:]) if violates(a[1], b[1])]
for a, b in bad:
    print(f"ANCHOR ORDER VIOLATION: {a} before {b}", file=sys.stderr)
assert not bad, "curated anchor base is not collation-monotone; fix EXCLUDE"

# 3b. hand-curated additions, validated before becoming anchors.
# Readings written "lu"/"nu"/"lue"/"nue" are AMBIGUOUS under the
# toneless ü→u convention (the u and ü originals occupy different
# collation segments), so a lü char written "lu" used as an anchor
# would mislabel every luan/luo/lüe char between a true-lu anchor and
# itself. Such additions are accepted as DIRECT entries only — they
# never bracket an interpolation segment.
AMBIG = {"lu", "nu", "lue", "nue"}
idx = {ch: i for i, (ch, _) in enumerate(order)}
additions = {}
direct_only = {}
rejected = 0
for ln in open(ADDS, encoding="utf-8"):
    ln = ln.rstrip("\n")
    if not ln or ln.startswith("#"):
        continue
    ch, syl = ln.split("\t")
    syl = syl.lower()
    assert re.fullmatch(r"[a-z]{1,6}", syl), f"malformed reading {ch} {syl}"
    if ch in anchors:
        continue  # curated table is authoritative on overlap
    if ch not in idx:
        print(f"REJECT {ch} {syl}: not in glibc collation order",
              file=sys.stderr)
        rejected += 1
        continue
    if letter.get(ch) != syl[0]:
        # AMBIG readings never anchor, so the (occasionally quirky) Perl
        # bucket is not load-bearing for them — the curated-neighborhood
        # check below still gates the direct entry (略/掠 lue sit in
        # Perl's 'e' bucket but between curated lu..lun in glibc).
        if syl not in AMBIG:
            print(f"REJECT {ch} {syl}: perl bucket {letter.get(ch)!r} != "
                  f"initial {syl[0]!r}", file=sys.stderr)
            rejected += 1
            continue
    # Independent per-addition check against the CURATED trust root:
    # the reading must sort consistently between the nearest curated
    # anchors around the char's glibc position. Doing this per-char
    # (not pairwise over merged additions) avoids eviction cascades
    # where one bad addition knocks out correct later ones.
    prev_c = next_c = None
    for j in range(idx[ch] - 1, -1, -1):
        if order[j][0] in anchors: prev_c = anchors[order[j][0]]; break
    for j in range(idx[ch] + 1, len(order)):
        if order[j][0] in anchors: next_c = anchors[order[j][0]]; break
    if (prev_c and violates(prev_c, syl)) or (next_c and violates(syl, next_c)):
        print(f"REJECT {ch} {syl}: inconsistent with curated neighborhood "
              f"({prev_c} .. {next_c})", file=sys.stderr)
        rejected += 1
        continue
    if syl in AMBIG:
        direct_only[ch] = syl
    else:
        additions[ch] = syl

# monotonicity over the MERGED anchor sequence, same `violates`
# predicate as the base check. Curated anchors are the trust root and
# are never evicted. When BOTH members of a violating pair are
# additions (each curated-consistent, e.g. a polyphone whose glibc
# position is a variant reading inside the same curated gap), the one
# with more total violations across the sequence is the outlier; its
# reading already passed the curated check, so DEMOTE it to a
# direct-only entry instead of dropping it.
changed = True
while changed:
    changed = False
    merged = [(ch, anchors[ch] if ch in anchors else additions[ch],
               ch in additions)
              for ch, _ in order if ch in anchors or ch in additions]
    syls = [m[1] for m in merged]
    def vio_count(i):
        return (sum(violates(syls[i], s) for s in syls[i+1:]) +
                sum(violates(s, syls[i]) for s in syls[:i]))
    for i, (a, b) in enumerate(zip(merged, merged[1:])):
        if violates(a[1], b[1]):
            if a[2] and b[2]:
                victim = a if vio_count(i) >= vio_count(i + 1) else b
            else:
                victim = b if b[2] else a
            assert victim[2], f"curated violation {a[:2]} before {b[:2]}"
            print(f"DEMOTE {victim[0]} {victim[1]}: collation position is "
                  "a variant reading; direct entry only", file=sys.stderr)
            del additions[victim[0]]
            direct_only[victim[0]] = victim[1]
            changed = True
            break
print(f"hand additions accepted: {len(additions)} anchor + "
      f"{len(direct_only)} direct-only (ambiguous u/u-umlaut), "
      f"rejected: {rejected}", file=sys.stderr)
anchors = {**anchors, **additions}

# 4. interpolate between same-syllable anchor pairs
out = {}
last_anchor = None  # (index, syllable)
pending = []
for i, (ch, freq) in enumerate(order):
    if ch in anchors:
        syl = anchors[ch]
        if last_anchor is not None and last_anchor == syl:
            for pch, pfreq in pending:
                if letter.get(pch) == syl[0]:
                    out[pch] = (syl, pfreq)
        last_anchor = syl
        pending = []
    else:
        pending.append((ch, freq))

# drop chars already curated; keep CJK Unified block only
new = {ch: v for ch, v in out.items()
       if ch not in anchors and 0x4E00 <= ord(ch) <= 0x9FFF}
print(f"interpolated new chars: {len(new)}", file=sys.stderr)

freqs = sorted((v[1] for v in new.values()), reverse=True)
for k in (500, 1000, 2000, 3000, 4000):
    if k <= len(freqs):
        print(f"  top-{k} freq cutoff: {freqs[k-1]}", file=sys.stderr)

# 5. emit: min corpus freq keeps the table meaningful (freq >= 10).
# Accepted hand additions are direct entries too (they are anchors, so
# step 4 excluded them); the curated Scala table itself never re-emits.
freq_of = dict(order)
for ch, syl in {**additions, **direct_only}.items():
    new[ch] = (syl, max(freq_of.get(ch, 0), 10))
kept = sorted(((ch, syl, f) for ch, (syl, f) in new.items() if f >= 10),
              key=lambda t: ord(t[0]))
print(f"kept (freq>=10): {len(kept)}", file=sys.stderr)
with open("/root/repo/src/main/resources/graft/hanzi_pinyin_snapshot.dat",
          "w", encoding="utf-8") as fh:
    fh.write("# hanzi -> pinyin (dominant reading, toneless, Title-case)\n")
    fh.write("# generated by tools/gen_hanzi_pinyin.py — see header there\n")
    for ch, syl, f in kept:
        fh.write(f"{ch}\t{syl.title()}\n")
print("wrote hanzi_pinyin_snapshot.dat", file=sys.stderr)
