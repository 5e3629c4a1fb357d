"""Sort-join abundance path == scatter/table path, exactly.

The sort-join path (kernels/features.py: one device sort derives every
window's jellyfish-equivalent global count from its run length; a second
sort restores stream order) replaces the dense global table when the
dataset's windows fit on the device. It must agree bit-for-bit with the
table path, including the keep_dropped stream semantics: dropped-group
reads count globally (jellyfish counts the whole file) but never reach a
histogram.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pangaea_tpu.config import FeatureConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.io.grouping import ReadPair, iter_barcode_groups
from pangaea_tpu.io.packing import GroupPacker
from pangaea_tpu.kernels.features import (abundance_histogram,
                                          abundance_histogram_from_bins,
                                          batch_kmer_keys, count_kmers_global,
                                          kmer_key_sentinel,
                                          make_global_table, sortjoin_bins)


def test_sortjoin_bins_reference():
    """bins from run lengths == bins from an explicit count table."""
    k, window, vec = 6, 3, 7
    rng = np.random.default_rng(0)
    n = 1000
    keys = rng.integers(0, 4 ** k, n).astype(np.int32)
    keys[rng.random(n) < 0.2] = kmer_key_sentinel(k)  # invalid windows
    bins = np.asarray(sortjoin_bins(jnp.asarray(keys), k=k, window=window,
                                    vector_size=vec))
    vals, counts = np.unique(keys[keys < kmer_key_sentinel(k)],
                             return_counts=True)
    table = dict(zip(vals.tolist(), counts.tolist()))
    for i, key in enumerate(keys):
        if key >= kmer_key_sentinel(k):
            assert bins[i] == -1
            continue
        b = table[int(key)] // window
        assert bins[i] == (b if b < vec else -1), i


def _rand_pairs(rng, n_barcodes=12, pairs_per_bc=5, read_len=40):
    pairs = []
    for b in range(n_barcodes):
        bc = f"BC{b:04d}"
        # some barcodes get a single short pair -> dropped by min_len
        npairs = 1 if b % 4 == 0 else int(rng.integers(2, pairs_per_bc + 1))
        for p in range(npairs):
            def seq():
                s = "".join("ACGT"[c] for c in rng.integers(0, 4, read_len))
                if rng.random() < 0.3:
                    i = int(rng.integers(0, read_len))
                    s = s[:i] + "N" + s[i + 1:]
                return s
            pairs.append(ReadPair(f"r{b}_{p}", bc, seq(), seq()))
    return pairs


def test_keep_dropped_rows():
    """keep_dropped emits dropped groups' reads as seg -1 rows and leaves
    the kept groups' names/rows identical."""
    rng = np.random.default_rng(1)
    pairs = _rand_pairs(rng)

    def chunks(keep):
        gp = GroupPacker(min_len=170, max_read_len=48, overlap=6,
                         reads_per_batch=8, groups_per_chunk=5,
                         keep_dropped=keep)
        return list(gp.iter_chunks(iter_barcode_groups(iter(pairs))))

    base, kd = chunks(False), chunks(True)
    assert [c.names for c in base] == [c.names for c in kd]

    def kept_rows(cs):
        rows = []
        for c in cs:
            for b in c.batches:
                for i in range(len(b.lengths)):
                    if b.seg_ids[i] >= 0:
                        rows.append((bytes(b.codes[i].tobytes()),
                                     int(b.lengths[i]), int(b.seg_ids[i])))
        return rows

    assert kept_rows(base) == kept_rows(kd)
    n_dropped = sum(int((b.seg_ids == -1).sum() - (b.lengths == 0).sum())
                    for c in kd for b in c.batches)
    total_reads = 2 * len(pairs)
    kept_reads = len(kept_rows(base))
    assert n_dropped == total_reads - kept_reads > 0


@pytest.mark.parametrize("seed", [0, 2])
def test_sortjoin_matches_scatter(seed):
    """Chunked sort-join histogram == scatter path fed a table built from
    the full keep_dropped stream (== jellyfish over all reads)."""
    k, window, vec, min_len = 7, 2, 50, 170
    rng = np.random.default_rng(seed)
    pairs = _rand_pairs(rng)
    gp = GroupPacker(min_len=min_len, max_read_len=48, overlap=k - 1,
                     reads_per_batch=8, groups_per_chunk=5,
                     keep_dropped=True)
    chunks = list(gp.iter_chunks(iter_barcode_groups(iter(pairs))))
    G = gp.groups_per_chunk
    all_batches = [b for c in chunks for b in c.batches]

    # reference: dense table over ALL rows (incl. seg -1), then scatter
    table = make_global_table(k)
    for b in all_batches:
        table = count_kmers_global(
            table, jnp.asarray(b.codes), jnp.asarray(b.lengths),
            jnp.asarray(b.cont), k=k, overlap=k - 1)

    # sort-join: keys from the same batches, pow2 sentinel padding
    keys_parts = [batch_kmer_keys(jnp.asarray(b.codes),
                                  jnp.asarray(b.lengths),
                                  jnp.asarray(b.cont), k=k, overlap=k - 1)
                  for b in all_batches]
    total = sum(p.shape[0] for p in keys_parts)
    npad = 1 << (total - 1).bit_length()
    if npad > total:
        keys_parts.append(jnp.full(npad - total, kmer_key_sentinel(k),
                                   jnp.int32))
    bins = sortjoin_bins(jnp.concatenate(keys_parts), k=k, window=window,
                         vector_size=vec)

    per_batch = keys_parts[0].shape[0]
    rows = all_batches[0].codes.shape[0]
    off = 0
    for chunk in chunks:
        want = jnp.zeros(G * vec, jnp.int32)
        got = jnp.zeros((G, vec), jnp.int32)
        for b in chunk.batches:
            want = abundance_histogram(
                want, table, jnp.asarray(b.codes), jnp.asarray(b.lengths),
                jnp.asarray(b.seg_ids), jnp.asarray(b.cont), k=k,
                window=window, vector_size=vec, overlap=k - 1)
            got = abundance_histogram_from_bins(
                got, bins[off:off + per_batch].reshape(rows, -1),
                jnp.asarray(b.seg_ids), vector_size=vec, n_groups=G)
            off += per_batch
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want).reshape(G, vec))


def test_feature_extractor_sortjoin_equivalence(tmp_path):
    """extract_features with hist_impl='sortjoin' == 'scatter', end to end
    (single-stream sort-join vs two-pass table on the same interleaved
    input)."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=5_000, n_barcodes=12,
        pairs_per_barcode=6, read_len=40, seed=5)
    outs = {}
    for impl in ("scatter", "sortjoin"):
        cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                            max_read_len=64, reads_per_batch=32,
                            hist_impl=impl, min_qual_char=None)
        fe = FeatureExtractor(cfg, str(tmp_path / impl))
        outs[impl] = fe.extract_features(interleaved=fq)
    n_sc, a_sc, t_sc = outs["scatter"]
    n_sj, a_sj, t_sj = outs["sortjoin"]
    np.testing.assert_array_equal(n_sc, n_sj)
    np.testing.assert_array_equal(a_sc, a_sj)
    np.testing.assert_array_equal(t_sc, t_sj)


def test_sortjoin_overflow_falls_back(tmp_path):
    """A dataset over the device window cap runs the chunked host-spill
    join and still produces identical features."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=4_000, n_barcodes=8,
        pairs_per_barcode=5, read_len=40, seed=7)
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=32,
                        hist_impl="sortjoin", min_qual_char=None,
                        sortjoin_max_windows=100)  # force overflow
    fe = FeatureExtractor(cfg, str(tmp_path / "ovf"))
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="scatter", min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_sortjoin_overflow_single_reread(tmp_path, monkeypatch):
    """Over-cap datasets spill keys to host and join chunked: the FASTQ is
    still read exactly ONCE (the old table fallback re-read it for
    abundance; a full restart would read it three times)."""
    import pangaea_tpu.features as fmod
    import pangaea_tpu.native as nat
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=4_000, n_barcodes=8,
        pairs_per_barcode=5, read_len=40, seed=7)
    monkeypatch.setattr(nat, "native_available", lambda: False)
    opens = []
    real_iter = fmod.iter_read_pairs_interleaved

    def counting_iter(path):
        opens.append(path)
        return real_iter(path)

    monkeypatch.setattr(fmod, "iter_read_pairs_interleaved", counting_iter)
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=32,
                        hist_impl="sortjoin", min_qual_char=None,
                        sortjoin_max_windows=100)  # force overflow
    fe = FeatureExtractor(cfg, str(tmp_path / "ovf"))
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    assert len(opens) == 1, opens  # single streaming pass, even over-cap
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="scatter", min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_estimate_stream_windows_exact_on_small_file(tmp_path):
    """The sampled-prefix window estimator is exact when the sample covers
    the file (and therefore accurate, not a gz-ratio guess, at scale)."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    for name in ("est.fq.gz", "est.fq"):
        fq = str(tmp_path / name)
        simulate_linked_reads(
            out_interleaved=fq, n_species=2, genome_len=4_000,
            n_barcodes=8, pairs_per_barcode=5, read_len=40, seed=3)
        cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                            max_read_len=64, reads_per_batch=32,
                            min_qual_char=None)
        fe = FeatureExtractor(cfg, str(tmp_path / ("d" + name)))
        est = fe._estimate_stream_windows(fq)
        n_reads = 8 * 5 * 2  # all <= row_len, one row each
        batches = -(-n_reads // 32)
        exact = batches * 32 * (64 - 9 + 1)
        assert est == exact, (est, exact)


def test_auto_row_len_equivalence(tmp_path):
    """auto_row_len packs narrow rows; features are unchanged, and
    rows narrower than the reads (python split path) are also exact."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=5_000, n_barcodes=10,
        pairs_per_barcode=6, read_len=40, seed=9)
    outs = {}
    for tag, kw in (
            ("wide", dict(auto_row_len=False)),
            ("auto", dict(auto_row_len=True)),
            # narrower than the reads: python packer splits across rows
            ("split", dict(auto_row_len=False, max_read_len=32))):
        cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                            max_read_len=kw.pop("max_read_len", 64),
                            reads_per_batch=32, hist_impl="sortjoin",
                            min_qual_char=None, **kw)
        fe = FeatureExtractor(cfg, str(tmp_path / tag))
        if tag == "split":
            # the native path raises on overlong reads; force python
            import pangaea_tpu.native as nat
            saved = nat.native_available
            nat.native_available = lambda: False
            try:
                outs[tag] = fe.extract_features(interleaved=fq)
            finally:
                nat.native_available = saved
        else:
            outs[tag] = fe.extract_features(interleaved=fq)
        if tag == "auto":
            assert fe.row_len == 40
    for tag in ("auto", "split"):
        np.testing.assert_array_equal(outs["wide"][1], outs[tag][1])
        np.testing.assert_array_equal(outs["wide"][2], outs[tag][2])
        assert outs["wide"][0].tolist() == outs[tag][0].tolist()


def test_auto_row_len_retry(tmp_path, monkeypatch):
    """A native-path overlong read after a too-small sampled row width
    retries once at max_read_len and still matches."""
    import pangaea_tpu.native as nat
    if not nat.native_available():
        import pytest
        pytest.skip("native IO unavailable")
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=5_000, n_barcodes=10,
        pairs_per_barcode=6, read_len=40, seed=9)
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=32,
                        hist_impl="sortjoin", min_qual_char=None)
    fe = FeatureExtractor(cfg, str(tmp_path / "retry"))
    monkeypatch.setattr(FeatureExtractor, "_auto_row_len",
                        lambda self, *a, **k: 16)  # too small for 40 bp
    out_r = fe.extract_features(interleaved=fq)
    assert fe.row_len == 64  # fell back to the configured width
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="sortjoin", min_qual_char=None,
                         auto_row_len=False)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "plain"))
    out_p = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(out_r[1], out_p[1])
    np.testing.assert_array_equal(out_r[2], out_p[2])


# ---- row-grouped restore + split-word (k > 15) path ----------------------


def test_rowgrouped_bins_match_exact():
    """sortjoin_bins_rowgrouped == sortjoin_bins up to within-row order,
    including a non-row-multiple sentinel padding tail."""
    from pangaea_tpu.kernels.features import sortjoin_bins_rowgrouped
    k, window, vec, wrow = 6, 3, 7, 9
    rng = np.random.default_rng(3)
    real = 40 * wrow
    n = real + 13  # padding tail not a multiple of wrow
    keys = rng.integers(0, 4 ** k, n).astype(np.int32)
    keys[rng.random(n) < 0.2] = kmer_key_sentinel(k)
    keys[real:] = kmer_key_sentinel(k)
    exact = np.asarray(sortjoin_bins(jnp.asarray(keys), k=k, window=window,
                                     vector_size=vec))
    rg = np.asarray(sortjoin_bins_rowgrouped(
        jnp.asarray(keys), k=k, window=window, vector_size=vec,
        row_windows=wrow))
    for r in range(real // wrow):
        np.testing.assert_array_equal(
            np.sort(exact[r * wrow:(r + 1) * wrow]),
            np.sort(rg[r * wrow:(r + 1) * wrow]), err_msg=f"row {r}")
    assert (rg[real:] == -1).all()


def _np_windows64(codes, lengths, k):
    """uint64 oracle: forward window values + validity (numpy)."""
    R, L = codes.shape
    W = L - k + 1
    c = codes.astype(np.uint64)
    safe = np.where(c < 4, c, 0)
    acc = np.zeros((R, W), np.uint64)
    for j in range(k):
        acc = (acc << np.uint64(2)) | safe[:, j:j + W]
    bad = (c >= 4).astype(np.int32)
    cs = np.cumsum(bad, axis=1)
    nbad = cs[:, k - 1:] - np.pad(cs, ((0, 0), (1, 0)))[:, :W]
    starts = np.arange(W)[None, :]
    valid = (nbad == 0) & (starts + k <= lengths[:, None])
    return acc, valid


def _np_revcomp64(vals, k):
    """Reference uint64 revcomp bit-twiddle (count_kmer.cpp:11-21)."""
    x = np.asarray(vals, np.uint64)
    m = np.uint64
    x = ((x >> m(2)) & m(0x3333333333333333)) \
        | ((x & m(0x3333333333333333)) << m(2))
    x = ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F)) \
        | ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4))
    x = ((x >> m(8)) & m(0x00FF00FF00FF00FF)) \
        | ((x & m(0x00FF00FF00FF00FF)) << m(8))
    x = ((x >> m(16)) & m(0x0000FFFF0000FFFF)) \
        | ((x & m(0x0000FFFF0000FFFF)) << m(16))
    x = (x >> m(32)) | (x << m(32))
    x = x ^ m(0xAAAAAAAAAAAAAAAA)
    return x >> m(2 * (32 - k))


@pytest.mark.parametrize("k", [17, 21, 31])
def test_pair_encode_matches_uint64_oracle(k):
    from pangaea_tpu.kernels.encode import (canonical_kmers_pair,
                                            kmer_window_values_pair)
    rng = np.random.default_rng(k)
    R, L = 16, 48
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    codes[rng.random((R, L)) < 0.05] = 4  # Ns
    lengths = rng.integers(k, L + 1, R).astype(np.int32)
    hi, lo, valid = kmer_window_values_pair(
        jnp.asarray(codes), jnp.asarray(lengths), k)
    chi, clo = canonical_kmers_pair(hi, lo, k)
    got = (np.asarray(chi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(clo).astype(np.uint64)
    vals, valid_np = _np_windows64(codes, lengths, k)
    canon = np.minimum(vals, _np_revcomp64(vals, k))
    np.testing.assert_array_equal(np.asarray(valid), valid_np)
    np.testing.assert_array_equal(got[valid_np], canon[valid_np])
    fwd = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(lo).astype(np.uint64)
    np.testing.assert_array_equal(fwd[valid_np], vals[valid_np])


@pytest.mark.parametrize("rowgrouped", [False, True])
def test_sortjoin_bins_pair_reference(rowgrouped):
    """Split-word bins == dict-count oracle over the 64-bit keys."""
    from pangaea_tpu.kernels.features import (kmer_key_sentinel_pair,
                                              sortjoin_bins_pair,
                                              sortjoin_bins_pair_rowgrouped)
    k, window, vec, wrow = 21, 3, 7, 10
    rng = np.random.default_rng(9)
    n = 1000
    # a small key universe forces multi-element runs
    hi = rng.integers(0, 8, n).astype(np.uint32)
    lo = rng.integers(0, 16, n).astype(np.uint32)
    shi, slo = kmer_key_sentinel_pair(k)
    inv = rng.random(n) < 0.2
    hi[inv], lo[inv] = shi, slo
    key64 = (hi.astype(np.uint64) << np.uint64(32)) | lo
    sent64 = (np.uint64(shi) << np.uint64(32)) | np.uint64(slo)
    from collections import Counter
    table = Counter(key64[~inv].tolist())

    def want_bin(i):
        if key64[i] == sent64:
            return -1
        b = table[int(key64[i])] // window
        return b if b < vec else -1

    if rowgrouped:
        bins = np.asarray(sortjoin_bins_pair_rowgrouped(
            jnp.asarray(hi), jnp.asarray(lo), k=k, window=window,
            vector_size=vec, row_windows=wrow))
        want = np.array([want_bin(i) for i in range(n)])
        for r in range(n // wrow):
            sl = slice(r * wrow, (r + 1) * wrow)
            np.testing.assert_array_equal(np.sort(bins[sl]),
                                          np.sort(want[sl]))
    else:
        bins = np.asarray(sortjoin_bins_pair(
            jnp.asarray(hi), jnp.asarray(lo), k=k, window=window,
            vector_size=vec))
        for i in range(n):
            assert bins[i] == want_bin(i), i


def test_feature_extractor_k21_matches_string_oracle(tmp_path):
    """End-to-end k=21 features (split-word sort-join — the ONLY large-k
    path) == a brute-force string-level oracle of the reference contract:
    global canonical-21-mer counts over all reads, per-barcode histogram
    of count//window over kept groups."""
    from collections import Counter

    from pangaea_tpu.io.sim import simulate_linked_reads

    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=4_000, n_barcodes=10,
        pairs_per_barcode=6, read_len=50, seed=11)
    from pangaea_tpu.io.grouping import iter_read_pairs_interleaved
    k, window, vec, min_len = 21, 2, 50, 250
    cfg = FeatureConfig(kmer=k, tnf_kmer=4, min_length=min_len,
                        max_read_len=64, reads_per_batch=32,
                        min_qual_char=None, vector_size=vec,
                        window_size=window)
    fe = FeatureExtractor(cfg, str(tmp_path / "k21"))
    names, abd, tnf = fe.extract_features(interleaved=fq)

    # ---- oracle ----
    comp = str.maketrans("ACGT", "TGCA")

    def canon(w):
        rc = w.translate(comp)[::-1]
        return min(w, rc)

    def windows(s):
        for i in range(len(s) - k + 1):
            w = s[i:i + k]
            if all(ch in "ACGT" for ch in w):
                yield canon(w)

    pairs = list(iter_read_pairs_interleaved(fq))
    table = Counter()
    for p in pairs:
        table.update(windows(p.seq1))
        table.update(windows(p.seq2))
    groups = list(iter_barcode_groups(iter(pairs), bug_compat=True))
    want_names, want_rows = [], []
    for barcode, gpairs in groups:
        seqs = [s for p in gpairs for s in (p.seq1, p.seq2)]
        if not barcode or sum(len(s) for s in seqs) <= min_len:
            continue
        row = np.zeros(vec, np.int64)
        for s in seqs:
            for w in windows(s):
                b = table[w] // window
                if b < vec:
                    row[b] += 1
        want_names.append(barcode)
        want_rows.append(row)
    assert list(names) == want_names
    np.testing.assert_array_equal(abd, np.array(want_rows))


def test_sortjoin_pad_size_properties():
    """Pad size covers n, is reachable by few compilations (pow2 below
    the quantum, quantum multiples above), and keeps sentinel overhead
    under ~3% at large n (sentinels are pure sort cost — DESIGN.md 3b)."""
    from pangaea_tpu.kernels.features import (_SORTJOIN_PAD_QUANTUM,
                                              sortjoin_pad_size)
    q = _SORTJOIN_PAD_QUANTUM
    for n in [1, 2, 3, q - 1, q, q + 1, 10 * q - 5, 33_914_880]:
        p = sortjoin_pad_size(n)
        assert p >= n
        if n <= q:
            assert p & (p - 1) == 0  # pow2
        else:
            assert (p % q == 0 or p & (p - 1) == 0) and p - n < q
            assert (p - n) / n < 0.03 or n < 32 * q
    # lax.sort steps ~32% just past pow2 boundaries (tools/ab_sort_pad.py)
    # so a pow2 sitting between n and the next 1M multiple wins
    assert sortjoin_pad_size(33_200_000) == 1 << 25
    assert sortjoin_pad_size((1 << 25) + 1) == 32 * q + q  # past pow2: grid
    assert sortjoin_pad_size(1 << 25) == 1 << 25


def test_chunked_sortjoin_multirange_matches_scatter(tmp_path):
    """A cap small enough to force MANY key-value ranges through
    _chunked_sortjoin_bins still reproduces the scatter path exactly
    (each range joins independently; equal keys share a range)."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=3, genome_len=6_000, n_barcodes=12,
        pairs_per_barcode=6, read_len=48, seed=13)
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=32,
                        hist_impl="sortjoin", min_qual_char=None,
                        sortjoin_max_windows=700)
    fe = FeatureExtractor(cfg, str(tmp_path / "chunked"))
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="scatter", min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_chunked_sortjoin_midstream_spill(tmp_path, monkeypatch):
    """When the upfront estimate lowballs, the spill engages MID-STREAM
    (already-collected device keys move to host) and the result is still
    exact with a single read of the stream."""
    import pangaea_tpu.features as fmod
    import pangaea_tpu.native as nat
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=4_000, n_barcodes=8,
        pairs_per_barcode=5, read_len=40, seed=7)
    # lie: pretend the stream is tiny so spill does NOT engage upfront
    monkeypatch.setattr(fmod.FeatureExtractor, "_estimate_stream_windows",
                        lambda self, path: 10)
    monkeypatch.setattr(nat, "native_available", lambda: False)
    opens = []
    real_iter = fmod.iter_read_pairs_interleaved

    def counting_iter(path):
        opens.append(path)
        return real_iter(path)

    monkeypatch.setattr(fmod, "iter_read_pairs_interleaved", counting_iter)
    cfg = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                        max_read_len=64, reads_per_batch=32,
                        hist_impl="sortjoin", min_qual_char=None,
                        sortjoin_max_windows=2000)
    fe = FeatureExtractor(cfg, str(tmp_path / "mid"))
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    assert len(opens) == 1, opens
    cfg2 = FeatureConfig(kmer=9, tnf_kmer=4, min_length=100,
                         max_read_len=64, reads_per_batch=32,
                         hist_impl="scatter", min_qual_char=None)
    fe2 = FeatureExtractor(cfg2, str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_chunked_sortjoin_large_k_split_word(tmp_path):
    """15 < k <= 31 over the cap: split-word (hi, lo) keys spill as one
    packed uint64 per window and chunk by 64-bit key value. Baseline =
    the same k with an uncapped single sort (itself byte-parity-pinned
    vs the reference binary at k=21 in test_reference_parity.py)."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=5_000, n_barcodes=10,
        pairs_per_barcode=5, read_len=48, seed=23)
    k = 21
    base = dict(kmer=k, tnf_kmer=4, min_length=100, max_read_len=64,
                reads_per_batch=32, hist_impl="sortjoin",
                min_qual_char=None)
    fe1 = FeatureExtractor(FeatureConfig(**base, sortjoin_max_windows=600),
                           str(tmp_path / "chunked"))
    n1, a1, t1 = fe1.extract_features(interleaved=fq)
    fe2 = FeatureExtractor(FeatureConfig(**base), str(tmp_path / "one"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.parametrize("store", ["device", "host", "disk"])
def test_aggregated_spill_stores_match_scatter(tmp_path, store):
    """The aggregated spill (device sort+RLE, VERDICT r4 item 1) equals
    the scatter oracle under every run-id residency tier."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=4_000, n_barcodes=10,
        pairs_per_barcode=6, read_len=40, seed=13)
    kw = dict(kmer=9, tnf_kmer=4, min_length=100, max_read_len=64,
              reads_per_batch=32, min_qual_char=None)
    cfg = FeatureConfig(**kw, hist_impl="sortjoin",
                        sortjoin_max_windows=500, spill_agg="on",
                        spill_store=store,
                        spill_dir=(str(tmp_path / "sp")
                                   if store == "disk" else None))
    fe = FeatureExtractor(cfg, str(tmp_path / f"agg_{store}"))
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    fe2 = FeatureExtractor(FeatureConfig(**kw, hist_impl="scatter"),
                           str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)
    if store == "disk":
        # spill files are cleaned up after the join
        assert not any(f.startswith("spill_runids")
                       for f in __import__("os").listdir(tmp_path / "sp"))


def test_aggregated_spill_raw_ab_equal(tmp_path, monkeypatch):
    """PANGAEA_SPILL_IMPL A/B: raw and agg spills produce identical
    features (incl. the masked paired weighted join and midstream
    overflow engagement)."""
    import os as _os
    from pangaea_tpu.io.sim import simulate_linked_reads
    r1, r2 = str(tmp_path / "r1.fq.gz"), str(tmp_path / "r2.fq.gz")
    simulate_linked_reads(out_r1=r1, out_r2=r2, n_species=2,
                          genome_len=4_000, n_barcodes=10,
                          pairs_per_barcode=6, read_len=40,
                          low_qual_rate=0.2, seed=5)
    kw = dict(kmer=9, tnf_kmer=4, min_length=100, max_read_len=64,
              reads_per_batch=32, hist_impl="sortjoin",
              sortjoin_max_windows=600)
    outs = {}
    for impl in ("raw", "agg"):
        monkeypatch.setenv("PANGAEA_SPILL_IMPL", impl)
        fe = FeatureExtractor(FeatureConfig(**kw),
                              str(tmp_path / impl))
        outs[impl] = fe.extract_features(reads1=r1, reads2=r2)
    monkeypatch.delenv("PANGAEA_SPILL_IMPL")
    for a, b in zip(outs["raw"], outs["agg"]):
        np.testing.assert_array_equal(a, b)


def test_aggregated_spill_device_budget_demotes_to_host(tmp_path):
    """When device-resident run ids exceed spill_device_budget, later
    chunks demote to host RAM mid-run and the result is unchanged."""
    from pangaea_tpu.io.sim import simulate_linked_reads
    fq = str(tmp_path / "sim.fq.gz")
    simulate_linked_reads(
        out_interleaved=fq, n_species=2, genome_len=4_000, n_barcodes=10,
        pairs_per_barcode=6, read_len=40, seed=13)
    kw = dict(kmer=9, tnf_kmer=4, min_length=100, max_read_len=64,
              reads_per_batch=32, min_qual_char=None)
    cfg = FeatureConfig(**kw, hist_impl="sortjoin",
                        sortjoin_max_windows=500, spill_agg="on",
                        spill_store="device", spill_device_budget=4096)
    fe = FeatureExtractor(cfg, str(tmp_path / "bud"))
    n1, a1, t1 = fe.extract_features(interleaved=fq)
    fe2 = FeatureExtractor(FeatureConfig(**kw, hist_impl="scatter"),
                           str(tmp_path / "sc"))
    n2, a2, t2 = fe2.extract_features(interleaved=fq)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)
