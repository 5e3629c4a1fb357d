"""Bin materialization: split reads into per-cluster FASTQ files.

Behavior contract (reference src/cpptools/extract_reads.cpp:40-197):

- clusters.tsv lines are ``<cluster_id>\\t<bc1>,<bc2>,...``; lines whose id
  is the string ``-1`` are skipped entirely (their barcodes get no bin).
- per kept tsv line, in order, two outputs open:
  ``<prefix>_bin<ID>.fq`` and ``<prefix>_bin<ID>.barcode`` (ID is the
  literal id string from the tsv).
- interleaved input (:88-127): for each pair whose barcode maps to a
  cluster, the R1 header is rewritten to ``<name>\\tBX:Z:<bc>-1`` while
  the R2 header passes through untouched; the pair's 8 lines go to the
  bin fq and the barcode is appended once to the .barcode file.
- paired input (:131-186): both headers are rewritten; pairs whose R1/R2
  name or barcode disagree are dropped; output is interleaved
  (R1 record then R2 record).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

from pangaea_tpu.io.fastq import BarcodeParser, open_maybe_gzip


def read_clusters_tsv(path: str) -> Tuple[Dict[str, str], List[str]]:
    """Returns (barcode -> cluster-id-string, ordered kept id list)."""
    barcode2cluster: Dict[str, str] = {}
    ids: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            cid, _, rest = line.partition("\t")
            if cid == "-1":
                continue
            ids.append(cid)
            for bc in rest.split(","):
                if bc:
                    barcode2cluster[bc] = cid
    return barcode2cluster, ids


def _extract_reads_native(clusters_tsv: str, output_prefix: str,
                          reads1: str, reads2: str,
                          interleaved: str) -> bool:
    """C++ fast path (native/fastq_reader.cpp pgn_extract_reads — the
    reference's extract_reads is C++ too; the per-pair Python loop below
    costs ~10x more). Returns False when the library is unavailable or
    errors, in which case the caller falls back byte-compatibly."""
    import ctypes
    from pangaea_tpu.native import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "pgn_extract_reads"):
        return False
    lib.pgn_extract_reads.restype = ctypes.c_longlong
    lib.pgn_extract_reads.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_int]
    if interleaved:
        rc = lib.pgn_extract_reads(clusters_tsv.encode(),
                                   output_prefix.encode(),
                                   interleaved.encode(), b"", 1)
    else:
        rc = lib.pgn_extract_reads(clusters_tsv.encode(),
                                   output_prefix.encode(),
                                   reads1.encode(), reads2.encode(), 0)
    return rc >= 0


def extract_reads(clusters_tsv: str, output_prefix: str,
                  reads1: str = "", reads2: str = "",
                  interleaved: str = "") -> List[str]:
    """Split reads into bins; returns the list of written .fq paths."""
    barcode2cluster, ids = read_clusters_tsv(clusters_tsv)
    if (interleaved or (reads1 and reads2)) and _extract_reads_native(
            clusters_tsv, output_prefix, reads1, reads2, interleaved):
        return [f"{output_prefix}_bin{cid}.fq" for cid in ids]
    fq_files = {cid: open(f"{output_prefix}_bin{cid}.fq", "w")
                for cid in ids}
    bc_files = {cid: open(f"{output_prefix}_bin{cid}.barcode", "w")
                for cid in ids}
    parser = BarcodeParser()
    try:
        if interleaved:
            with open_maybe_gzip(interleaved) as f:
                it = iter(f)
                for h1 in it:
                    s1, p1, q1 = next(it), next(it), next(it)
                    h2, s2, p2, q2 = next(it), next(it), next(it), next(it)
                    name, bc = parser.parse(h1.rstrip("\n").lstrip("@"))
                    cid = barcode2cluster.get(bc)
                    if cid is None:
                        continue
                    fq_files[cid].write(
                        f"@{name}\tBX:Z:{bc}-1\n{s1}{p1}{q1}"
                        f"{h2}{s2}{p2}{q2}")
                    bc_files[cid].write(bc + "\n")
        elif reads1 and reads2:
            with open_maybe_gzip(reads1) as f1, open_maybe_gzip(reads2) as f2:
                it1, it2 = iter(f1), iter(f2)
                for h1 in it1:
                    s1, p1, q1 = next(it1), next(it1), next(it1)
                    h2, s2, p2, q2 = next(it2), next(it2), next(it2), next(it2)
                    n1, b1 = parser.parse(h1.rstrip("\n").lstrip("@"))
                    n2, b2 = parser.parse(h2.rstrip("\n").lstrip("@"))
                    cid = barcode2cluster.get(b1)
                    if cid is None or n1 != n2 or b1 != b2:
                        continue
                    fq_files[cid].write(
                        f"@{n1}\tBX:Z:{b1}-1\n{s1}{p1}{q1}"
                        f"@{n2}\tBX:Z:{b2}-1\n{s2}{p2}{q2}")
                    bc_files[cid].write(b1 + "\n")
        else:
            raise ValueError("reads must be specified")
    finally:
        for f in fq_files.values():
            f.close()
        for f in bc_files.values():
            f.close()
    return [f"{output_prefix}_bin{cid}.fq" for cid in ids]
