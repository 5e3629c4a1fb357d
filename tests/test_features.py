"""XLA feature kernels vs the Python oracle, incl. grouping quirks."""

import numpy as np
import pytest

import jax.numpy as jnp

from pangaea_tpu.io.grouping import ReadPair, group_kept, iter_barcode_groups
from pangaea_tpu.io.packing import GroupPacker, ReadPacker
from pangaea_tpu.kernels.encode import canonical_rank_lut, num_canonical_kmers
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          count_kmers_global, make_global_table,
                                          tnf_histogram)
from tests import oracle


def _rand_pairs(rng, n_barcodes=8, pairs_per_bc=6, read_len=40, with_n=True):
    pairs = []
    for b in range(n_barcodes):
        bc = f"BC{b:04d}"
        for p in range(rng.integers(1, pairs_per_bc + 1)):
            def seq():
                s = "".join("ACGT"[c] for c in rng.integers(0, 4, read_len))
                if with_n and rng.random() < 0.3:
                    i = int(rng.integers(0, read_len))
                    s = s[:i] + "N" + s[i + 1:]
                return s
            pairs.append(ReadPair(f"r{b}_{p}", bc, seq(), seq()))
    return pairs


def _run_kernels(pairs, k, window, vector_size, tnf_k, min_len,
                 max_read_len=64, reads_per_batch=32):
    # global pass: every read in the stream
    table = make_global_table(k)
    rp = ReadPacker(max_read_len=max_read_len, overlap=k - 1,
                    reads_per_batch=reads_per_batch)
    seqs = []
    for p in pairs:
        seqs += [(p.seq1, ""), (p.seq2, "")]
    for b in rp.iter_batches(iter(seqs)):
        table = count_kmers_global(table, jnp.asarray(b.codes),
                                   jnp.asarray(b.lengths), jnp.asarray(b.cont),
                                   k=k, overlap=k - 1)
    # feature pass
    gp = GroupPacker(min_len=min_len, max_read_len=max_read_len,
                     overlap=k - 1, reads_per_batch=reads_per_batch,
                     groups_per_chunk=3)
    lut = jnp.asarray(canonical_rank_lut(tnf_k))
    ncols = num_canonical_kmers(tnf_k)
    names, abd_rows, tnf_rows = [], [], []
    for chunk in gp.iter_chunks(iter_barcode_groups(iter(pairs))):
        G = chunk.num_groups
        abd = jnp.zeros(G * vector_size, dtype=jnp.int32)
        tnf = jnp.zeros(G * ncols, dtype=jnp.int32)
        for b in chunk.batches:
            args = (jnp.asarray(b.codes), jnp.asarray(b.lengths),
                    jnp.asarray(b.seg_ids), jnp.asarray(b.cont))
            abd = abundance_histogram(abd, table, *args, k=k, window=window,
                                      vector_size=vector_size, overlap=k - 1)
            tnf = tnf_histogram(tnf, lut, *args, k=tnf_k, num_cols=ncols,
                                overlap=k - 1)
        names += chunk.names
        abd_rows.append(np.asarray(abd).reshape(G, vector_size))
        tnf_rows.append(np.asarray(tnf).reshape(G, ncols))
    return (names, np.concatenate(abd_rows) if abd_rows else np.zeros((0, vector_size)),
            np.concatenate(tnf_rows) if tnf_rows else np.zeros((0, ncols)), table)


def _run_oracle(pairs, k, window, vector_size, tnf_k, min_len):
    all_seqs = [s for p in pairs for s in (p.seq1, p.seq2)]
    table = oracle.global_counts(all_seqs, k)
    groups = oracle.group_stream([(p.barcode, p.seq1, p.seq2) for p in pairs])
    names, abd, tnf = [], [], []
    for bc, seqs in groups:
        if not bc or len(oracle.concat_group(seqs)) <= min_len:
            continue
        names.append(bc)
        abd.append(oracle.abundance_hist(seqs, table, k, window, vector_size))
        tnf.append(oracle.tnf_counts(seqs, tnf_k))
    return names, np.array(abd), np.array(tnf), table


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_read_len", [64, 23])  # 23 forces row splitting
def test_features_match_oracle(seed, max_read_len):
    rng = np.random.default_rng(seed)
    pairs = _rand_pairs(rng)
    k, window, vector_size, tnf_k, min_len = 7, 3, 50, 4, 100
    names_o, abd_o, tnf_o, table_o = _run_oracle(pairs, k, window, vector_size,
                                                 tnf_k, min_len)
    names_k, abd_k, tnf_k_arr, table_k = _run_kernels(
        pairs, k, window, vector_size, tnf_k, min_len,
        max_read_len=max_read_len)
    assert names_k == names_o
    # global table parity
    tk = np.asarray(table_k)
    for c, n in table_o.items():
        assert tk[c] == n
    assert int(tk.sum()) == sum(table_o.values())
    np.testing.assert_array_equal(abd_k, abd_o)
    np.testing.assert_array_equal(tnf_k_arr, tnf_o)


def test_boundary_leak_grouping():
    pairs = [ReadPair("a", "B1", "A" * 10, "C" * 10),
             ReadPair("b", "B1", "G" * 10, "T" * 10),
             ReadPair("c", "B2", "A" * 10, "A" * 10)]
    groups = list(iter_barcode_groups(iter(pairs)))
    # first flush: empty barcode carrying first pair of B1
    assert groups[0][0] == "" and len(groups[0][1]) == 1
    # B1 group: second pair of B1 + first pair of B2 (the leak)
    assert groups[1][0] == "B1" and [p.name for p in groups[1][1]] == ["b", "c"]
    # final flush: B2 with nothing left
    assert groups[2][0] == "B2" and groups[2][1] == []


def test_group_filters():
    g = [ReadPair("a", "B", "A" * 10, "C" * 10)]
    assert not group_kept("", g, 5)
    assert group_kept("B", g, 21)   # concat len = 22 > 21
    assert not group_kept("B", g, 22)  # <= min_len dropped (count_kmer.cpp:62)


def test_jellyfish_dump_roundtrip(tmp_path):
    """export -> import reproduces the table; import re-canonicalizes
    (count_kmer.cpp:144-169 accepts either strand form)."""
    import jax.numpy as jnp
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.kernels.encode import decode_kmers, revcomp_kmers_np

    k = 5
    cfg = FeatureConfig(kmer=k)
    fe = FeatureExtractor(cfg, str(tmp_path))
    rng = np.random.RandomState(0)
    t = np.zeros(4 ** k, np.int32)
    keys = rng.choice(4 ** k, 50, replace=False).astype(np.uint32)
    canon = np.minimum(keys, revcomp_kmers_np(keys, k))
    np.add.at(t, canon.astype(np.int64), rng.randint(1, 9, 50))
    dump = str(tmp_path / "dump.tsv")
    fe.export_jellyfish_dump(jnp.asarray(t), dump)
    back = np.asarray(fe.import_jellyfish_dump(dump))
    np.testing.assert_array_equal(back, t)
    # non-canonical strand form in the dump is re-canonicalized
    nz = np.flatnonzero(t)
    rc = revcomp_kmers_np(nz.astype(np.uint32), k)
    with open(dump, "w") as f:
        for v, c in zip(rc, t[nz]):
            s = decode_kmers(np.array([v]), k)[0].decode()
            f.write(f"{s}\t{int(c)}\n")
    back2 = np.asarray(fe.import_jellyfish_dump(dump))
    np.testing.assert_array_equal(back2, t)


def test_group_features_from_imported_dump(tmp_path):
    """Binning against an externally-supplied jellyfish dump (the
    reference's count_kmer -g workflow, src/feature.py:107-109) matches
    the self-counted path."""
    import jax.numpy as jnp
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads

    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(out_interleaved=fq, n_species=2, genome_len=4000,
                          n_barcodes=10, pairs_per_barcode=6, read_len=40,
                          seed=4)
    cfg = FeatureConfig(kmer=9, min_length=100, max_read_len=64,
                        reads_per_batch=32, hist_impl="scatter",
                        min_qual_char=None)
    fe = FeatureExtractor(cfg, str(tmp_path / "self"))
    names, abd, tnf = fe.extract_features(interleaved=fq)
    table = fe.global_kmer_table(interleaved=fq)
    dump = str(tmp_path / "dump.tsv")
    fe.export_jellyfish_dump(table, dump)
    fe2 = FeatureExtractor(cfg, str(tmp_path / "imported"))
    t2 = fe2.import_jellyfish_dump(dump)
    n2, a2, _ = fe2.group_features(t2, interleaved=fq)
    assert names.tolist() == n2.tolist()
    np.testing.assert_array_equal(abd, a2)


def test_pack_transfers_exact():
    """2-bit packed transfer (pack_codes_host -> device unpack) is
    byte-identical to the raw uint8 code matrix, including N/pad bytes."""
    import jax.numpy as jnp
    from pangaea_tpu.features import _unpack_codes, pack_codes_host
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (64, 96)).astype(np.uint8)
    codes[rng.random((64, 96)) < 0.1] = 4
    codes[:, 90:] = 4  # pad tail
    p, m = pack_codes_host(codes)
    assert p.nbytes + m.nbytes == codes.nbytes * 3 // 8
    out = np.asarray(_unpack_codes(jnp.asarray(p), jnp.asarray(m)))
    np.testing.assert_array_equal(out, codes)


def test_pack_codes_inread_clean_path():
    """pack_codes_host_inread skips the mask plane when every in-read
    base is ACGT (pad columns decode 0, excluded by length everywhere),
    and keeps it when an N sits inside a read."""
    import jax.numpy as jnp
    from pangaea_tpu.features import (_unpack_codes, _unpack_codes_clean,
                                      pack_codes_host_inread)
    rng = np.random.default_rng(4)
    codes = np.full((32, 64), 4, np.uint8)
    lengths = rng.integers(20, 61, 32).astype(np.int32)
    for i, n in enumerate(lengths):
        codes[i, :n] = rng.integers(0, 4, n)
    p, m = pack_codes_host_inread(codes, lengths)
    assert m is None
    out = np.asarray(_unpack_codes_clean(jnp.asarray(p)))
    for i, n in enumerate(lengths):
        np.testing.assert_array_equal(out[i, :n], codes[i, :n])
    codes[5, 3] = 4  # an in-read N
    p, m = pack_codes_host_inread(codes, lengths)
    assert m is not None
    out = np.asarray(_unpack_codes(jnp.asarray(p), jnp.asarray(m)))
    for i, n in enumerate(lengths):
        np.testing.assert_array_equal(out[i, :n], codes[i, :n])


@pytest.mark.parametrize("with_ns", [False, True])
def test_pack_transfers_extraction_equal(tmp_path, with_ns):
    """extract_features with pack_transfers on == off, end to end —
    fused uploads (incl. the clean mask-free variant) vs raw transfers;
    with_ns plants in-read Ns so the mask plane must ship and apply."""
    import gzip as _gzip
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(out_interleaved=fq, n_species=2, genome_len=5_000,
                          n_barcodes=10, pairs_per_barcode=5, read_len=40,
                          seed=3)
    if with_ns:
        with _gzip.open(fq, "rt") as f:
            lines = f.read().splitlines()
        for i in range(1, len(lines), 16):  # every 4th record's seq line
            lines[i] = lines[i][:7] + "N" + lines[i][8:]
        with _gzip.open(fq, "wt") as f:
            f.write("\n".join(lines) + "\n")
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    outs = {}
    for mode in ("on", "off"):
        cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                            max_read_len=64, reads_per_batch=32,
                            min_qual_char=None, pack_transfers=mode)
        fe = FeatureExtractor(cfg, str(tmp_path / f"p{mode}"))
        outs[mode] = fe.extract_features(interleaved=fq)
    for a, b in zip(outs["on"], outs["off"]):
        np.testing.assert_array_equal(a, b)


def test_defer_save_identical_artifacts_and_marker_order(tmp_path):
    """extract_features(defer_save=True) must produce byte-identical
    .gz artifacts (decompressed; gzip mtime headers differ) and only
    write the feature_finished marker after both files land; the
    pipeline joins via wait_save/Pipeline.finish."""
    import gzip
    import os
    from pangaea_tpu.config import FeatureConfig
    from pangaea_tpu.features import FeatureExtractor
    from pangaea_tpu.io.sim import simulate_linked_reads

    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(out_interleaved=fq, n_species=2, genome_len=4000,
                          n_barcodes=10, pairs_per_barcode=6, read_len=40,
                          seed=9)
    cfg = FeatureConfig(kmer=9, min_length=100, max_read_len=64,
                        reads_per_batch=32, min_qual_char=None)
    fe_sync = FeatureExtractor(cfg, str(tmp_path / "sync"))
    fe_sync.extract_features(interleaved=fq)
    fe_bg = FeatureExtractor(cfg, str(tmp_path / "bg"))
    n, a, t = fe_bg.extract_features(interleaved=fq, defer_save=True)
    fe_bg.wait_save()
    assert os.path.exists(fe_bg.marker)
    for attr in ("abd_gz", "tnf_gz"):
        with gzip.open(getattr(fe_sync, attr)) as f1, \
                gzip.open(getattr(fe_bg, attr)) as f2:
            assert f1.read() == f2.read(), attr
    # second call is the artifact-cache load path and must round-trip
    n2, a2, t2 = fe_bg.extract_features(interleaved=fq)
    assert n.tolist() == n2.tolist()
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(t, t2)
    # wait_save is idempotent with nothing pending
    fe_bg.wait_save()
