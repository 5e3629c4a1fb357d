"""FASTQ streaming + linked-read barcode extraction.

Host-side input layer. The barcode parsing rules reproduce
``getBarcode`` in the reference C++ tools (count_kmer.cpp:23-53,
count_tnf.cpp:22-52, extract_reads.cpp:9-39):

- read type is inferred once, stickily, from the first header that matches:
  a header containing ``BX:Z`` => "10x" (also Tell-Seq after preprocessing);
  otherwise a header containing ``#`` => "stLFR".
- 10x: read name = header up to first whitespace; barcode = substring after
  ``BX:Z:`` up to the first ``-``.
- stLFR: read name = header before ``#``; barcode = between ``#`` and ``/``;
  barcode ``0_0_0`` means "no barcode" and becomes empty.

A faster native (C++) path is provided by pangaea_tpu.native when built;
this pure-Python module is the always-available fallback and the reference
for its tests.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional, Tuple


def open_maybe_gzip(path: str, mode: str = "rt"):
    if str(path).endswith(".gz"):
        if "t" in mode:
            return io.TextIOWrapper(gzip.open(path, mode.replace("t", "b")),
                                    encoding="ascii", newline="\n")
        return gzip.open(path, mode)
    return open(path, mode)


@dataclass
class FastqRecord:
    header: str   # without leading '@'
    seq: str
    qual: str


class BarcodeParser:
    """Sticky read-type inference + barcode extraction (count_kmer.cpp:25-53)."""

    def __init__(self, read_type: str = ""):
        self.read_type = read_type  # "", "10x", or "stLFR"

    def parse(self, header: str) -> Tuple[str, str]:
        """header is the '@'-stripped FASTQ header line.

        Returns (read_name, barcode); barcode == "" means unbarcoded.
        """
        if not self.read_type:
            if "BX:Z" in header:
                self.read_type = "10x"
            elif "#" in header:
                self.read_type = "stLFR"
        if self.read_type == "stLFR":
            pos1 = header.find("#")
            pos2 = header.find("/", pos1 + 1)
            name = header[:pos1]
            barcode = header[pos1 + 1: pos2 if pos2 != -1 else len(header)]
            if barcode == "0_0_0":
                barcode = ""
            return name, barcode
        # 10x / Tell-Seq (or not-yet-inferred): name up to whitespace
        end = len(header)
        for ch in " \r\t\n":
            p = header.find(ch)
            if p != -1 and p < end:
                end = p
        name = header[:end]
        barcode = ""
        pos1 = header.find("BX:Z")
        if pos1 != -1:
            pos2 = header.find("-", pos1 + 5)
            barcode = header[pos1 + 5: pos2 if pos2 != -1 else len(header)]
        return name, barcode


def iter_fastq_records(path_or_handle) -> Iterator[FastqRecord]:
    handle = (open_maybe_gzip(path_or_handle)
              if isinstance(path_or_handle, str) else path_or_handle)
    it = iter(handle)
    for header in it:
        seq = next(it).rstrip("\n")
        next(it)  # '+'
        qual = next(it).rstrip("\n")
        yield FastqRecord(header.rstrip("\n").lstrip("@"), seq, qual)


def iter_interleaved_pairs(path: str) -> Iterator[Tuple[FastqRecord, FastqRecord]]:
    """Yield (R1, R2) record pairs from an interleaved FASTQ."""
    it = iter_fastq_records(path)
    while True:
        try:
            r1 = next(it)
        except StopIteration:
            return
        r2 = next(it)
        yield r1, r2


def iter_paired_pairs(path1: str, path2: str) -> Iterator[Tuple[FastqRecord, FastqRecord]]:
    it1, it2 = iter_fastq_records(path1), iter_fastq_records(path2)
    for r1 in it1:
        yield r1, next(it2)


def barcode_sort_interleaved(in_path: str, out_path: str) -> None:
    """Sort an interleaved FASTQ by barcode tag, unbarcoded last.

    Reproduces the awk | LANG=C sort pipeline of src/run_pangaea:237-252:
    the sort key is the literal ``BX:Z:<barcode>`` token (or ``~~~`` when
    absent), and ties fall back to whole-record byte order (GNU sort
    without -s compares the full line as last resort). Divergence: the
    reference pipeline joins record lines with tabs and later ``tr``s every
    tab back to newline, which corrupts headers that themselves contain a
    tab before the BX:Z tag (e.g. preprocess_stlfr output); here records
    are kept as 8-line blocks, so tab headers survive intact.
    """
    entries = []
    with open_maybe_gzip(in_path) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines) - 7, 8):
        block = lines[i:i + 8]
        header = lines[i]
        tag = "~~~"
        p = header.find("BX:Z:")
        if p != -1:
            e = p
            while e < len(header) and not header[e].isspace():
                e += 1
            tag = header[p:e]
        entries.append((tag, block))
    entries.sort(key=lambda t: (t[0], t[1]))
    with open(out_path, "w") as out:
        for _, block in entries:
            out.write("\n".join(block) + "\n")
