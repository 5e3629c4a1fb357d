"""Independent transliteration of extract_unmapped.cpp's decision logic.

Used by tests/test_unmapped_parity.py as the expected-output oracle for
asm/unmapped.py: the reference binary needs htslib (absent from this
image), so instead the C++ control flow (parse_records,
extract_unmapped.cpp:11-135, and the coverage-file parse, :155-176) is
restated here FROM THE SOURCE, working directly on in-memory record
tuples — no shared code with the implementation under test beyond the
record dataclass fields.
"""

from typing import Dict, List, Sequence, Tuple

_COMP = {"A": "T", "T": "A", "C": "G", "G": "C"}


def _get_seq_qual(seq: str, qual: str, isreverse: bool) -> Tuple[str, str]:
    """extract_unmapped.cpp:11-53: reconstruct read orientation."""
    if not isreverse:
        return seq, qual
    out = "".join(_COMP.get(b, b) for b in reversed(seq))
    return out, qual[::-1]


def parse_records(records, contigs, ref_names: Sequence[str],
                  ref_lens: Sequence[int], idt: float = 0.95,
                  min_l: int = 60) -> Tuple[int, int, str]:
    """extract_unmapped.cpp:72-135 on one qname group.

    records: objects with .flag .tid .cigar [(op,len)] .seq .qual .qname
    .tags. Returns (read_unmapped, read_paired, fastq_text).
    """
    SUP, SEC, UNMAP = 0x800, 0x100, 0x4
    READ1, READ2, REV = 0x40, 0x80, 0x10
    read1seq = read1qual = read2seq = read2qual = ""
    read_unmapped = 1
    readname = ""
    for rec in records:
        flag = rec.flag
        is_read1, is_read2 = bool(flag & READ1), bool(flag & READ2)
        record_unmapped, isreverse = bool(flag & UNMAP), bool(flag & REV)
        readname = rec.qname
        # parse_reads runs BEFORE the unmapped check (cpp:90-92): even
        # unmapped records donate seq/qual; first record per mate wins
        if is_read1 and not read1seq:
            read1seq, read1qual = _get_seq_qual(rec.seq, rec.qual,
                                                isreverse)
        elif is_read2 and not read2seq:
            read2seq, read2qual = _get_seq_qual(rec.seq, rec.qual,
                                                isreverse)
        if record_unmapped:
            continue
        contigname = ref_names[rec.tid] if 0 <= rec.tid < len(ref_names) \
            else ""
        if not contigname or contigname not in contigs:
            continue
        cols = sum(ln for op, ln in rec.cigar if op in "MID")
        if cols < min_l:
            continue
        nm = rec.tags.get("NM", 0)
        if not isinstance(nm, int):
            nm = 0
        if 1.0 * (cols - nm) / cols < idt:
            continue
        read_unmapped = 0
    read_paired = 0
    ret = ""
    if read1seq and read2seq:
        read_paired = 1
        ret = (f"@{readname}/1\n{read1seq}\n+\n{read1qual}\n"
               f"@{readname}/2\n{read2seq}\n+\n{read2qual}\n")
    elif read1seq:
        ret = f"@{readname}/1\n{read1seq}\n+\n{read1qual}\n"
    elif read2seq:
        ret = f"@{readname}/2\n{read2seq}\n+\n{read2qual}\n"
    return read_unmapped, read_paired, ret


def keep_contigs(depth_lines: Sequence[str], cov_cutoff: float
                 ) -> List[str]:
    """extract_unmapped.cpp:155-176: 3rd tab field = totalAvgDepth."""
    keep = []
    for line in depth_lines:
        p1 = line.find("\t")
        name = line[:p1] if p1 != -1 else line
        if name == "contigName":
            continue
        p2 = line.find("\t", p1 + 1)
        p1b = line.find("\t", p2 + 1)
        cov = float(line[p2 + 1: p1b if p1b != -1 else len(line)])
        if cov >= cov_cutoff:
            keep.append(name)
    return keep


def expected_outputs(groups, depth_lines, cov_cutoff, ref_names, ref_lens,
                     idt: float = 0.95, min_l: int = 60
                     ) -> Tuple[str, str]:
    """(list_text, low_abd_fq_text) exactly as the binary writes them
    (cpp:167-176 list; cpp:213-231 emits only unmapped AND paired)."""
    keep = keep_contigs(depth_lines, cov_cutoff)
    contigs = set(keep)
    fq = ""
    for group in groups:
        unmapped, paired, ret = parse_records(group, contigs, ref_names,
                                              ref_lens, idt, min_l)
        if unmapped and paired:
            fq += ret
    return "".join(n + "\n" for n in keep), fq
