"""Reference-stack baseline: the real denominator for bench.py.

BASELINE.md defines the speed denominator as the reference's CPU stack —
jellyfish + C++ count_kmer/count_tnf + the torch VAE. This module builds
the reference binaries from /root/reference/src/cpptools (same recipe as
tests/test_reference_parity.py) and provides timed runners for:

  * count_kmer  (src/cpptools/count_kmer.cpp:112-122 CLI) fed a
    precomputed jellyfish-format dump — jellyfish itself is not installed
    in this image, so its global-count time is EXCLUDED from the
    denominator (generous to the reference).
  * count_tnf   (src/cpptools/count_tnf.cpp:118-124 CLI).
  * a torch replica of the reference VAE train step
    (src/models/VAENET.py:187-253 architecture incl. the
    LeakyReLU(True) ≡ identity quirk; src/pangaea.py defaults lr=0.005,
    weight_decay=1e-4, batch=2048, dropout=0.2).

The reference runs jellyfish+count_kmer and count_tnf concurrently in a
3-worker ThreadPoolExecutor (src/feature.py:28-39); with the dump given,
its feature wall-clock is max(count_kmer, count_tnf) — bench.py uses that
max, again generous to the reference on a 2-CPU host where true
concurrency would contend.
"""

from __future__ import annotations

import os
import subprocess
import time

REF = "/root/reference/src/cpptools"
BIN = "/tmp/pangaea_ref_bin"
TOOLS = ["count_kmer", "count_tnf"]


def build_ref_tools(tools=TOOLS) -> bool:
    """Compile the reference binaries into /tmp/pangaea_ref_bin (cached)."""
    if not os.path.isdir(REF):
        return False
    os.makedirs(BIN, exist_ok=True)
    for tool in tools:
        out = os.path.join(BIN, tool)
        if os.path.isfile(out):
            continue
        cmd = ["g++", "-O3", "-std=c++14", f"-I{REF}/lib/cmdline",
               f"-I{REF}/lib/gzstream", f"-I{REF}/lib/ThreadPool",
               f"{REF}/{tool}.cpp", f"{REF}/lib/gzstream/gzstream.C",
               "-lz", "-lpthread", "-o", out]
        r = subprocess.run(cmd, capture_output=True)
        if r.returncode:
            return False
    return True


def write_jellyfish_dump(fq, dump: str, k: int = 15,
                         batch_reads: int = 65536,
                         min_qual_char: str = "") -> int:
    """Global canonical k-mer counts of the FASTQ(s) as a jellyfish
    `dump -c -t` text file (numpy, exact). ``fq`` may be one path or a
    list (the reference's paired path feeds R1 then R2,
    src/feature.py:76-86). ``min_qual_char`` reproduces jellyfish's
    --min-qual-char: bases with quality below it become N before
    counting. Returns the read count. Used to feed count_kmer when
    jellyfish is not installed, and as interchange input for both
    pipelines."""
    import numpy as np
    from pangaea_tpu.io.fastq import iter_fastq_records
    from pangaea_tpu.kernels.encode import decode_kmers, revcomp_kmers_np

    lut = np.full(256, 4, np.uint8)
    for i, b in enumerate(b"ACTG"):
        lut[b] = i
    lut[ord("a")], lut[ord("c")], lut[ord("t")], lut[ord("g")] = 0, 1, 2, 3
    mq = ord(min_qual_char) if min_qual_char else 0

    parts = []
    seqs = []
    n_reads = 0

    def flush():
        if not seqs:
            return
        L = max(len(s) for s, _ in seqs)
        codes = np.full((len(seqs), L), 4, np.uint8)
        lens = np.zeros(len(seqs), np.int32)
        for i, (s, q) in enumerate(seqs):
            row = lut[np.frombuffer(s.encode(), np.uint8)]
            if mq:
                qa = np.frombuffer(q.encode(), np.uint8)
                m = min(len(qa), len(row))
                row = row.copy()
                row[:m][qa[:m] < mq] = 4
            codes[i, :len(s)] = row
            lens[i] = len(s)
        W = L - k + 1
        c = codes.astype(np.int64)
        safe = np.where(c < 4, c, 0)
        acc = np.zeros((len(seqs), W), np.int64)
        for j in range(k):
            acc = (acc << 2) | safe[:, j:j + W]
        bad = (c >= 4).astype(np.int32)
        cs = np.cumsum(bad, axis=1)
        nbad = cs[:, k - 1:] - np.pad(cs, ((0, 0), (1, 0)))[:, :W]
        valid = (nbad == 0) & (np.arange(W)[None, :] + k <= lens[:, None])
        vals = acc[valid]
        canon = np.minimum(
            vals, revcomp_kmers_np(vals.astype(np.uint32), k).astype(np.int64)
        ) if k <= 15 else np.minimum(vals, _revcomp64(vals, k))
        parts.append(canon)
        seqs.clear()

    def _revcomp64(vals, k):
        # complement of a 2-bit base is base^2 in the (ord>>1)&3 encoding
        v = vals.astype(np.uint64)
        out = np.zeros_like(v)
        for _ in range(k):
            out = (out << np.uint64(2)) | ((v & np.uint64(3))
                                           ^ np.uint64(2))
            v >>= np.uint64(2)
        return out.astype(np.int64)

    for path in ([fq] if isinstance(fq, str) else list(fq)):
        for rec in iter_fastq_records(path):
            seqs.append((rec.seq, rec.qual))
            n_reads += 1
            if len(seqs) >= batch_reads:
                flush()
    flush()
    keys, counts = np.unique(np.concatenate(parts), return_counts=True)
    strs = decode_kmers(keys.astype(np.int64), k)
    with open(dump, "w") as f:
        for s, c in zip(strs, counts):
            f.write(f"{s.decode()}\t{int(c)}\n")
    return n_reads


def _run_timed(argv) -> float:
    t0 = time.time()
    r = subprocess.run(argv, capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode:
        raise RuntimeError(f"{argv[0]} failed: {r.stderr[-500:]}")
    return dt


def run_count_kmer(interleaved: str, dump: str, out_gz: str, *, k: int = 15,
                   min_len: int = 2000, window: int = 10, vector: int = 400,
                   threads: int = 0) -> float:
    """Run the compiled reference count_kmer; returns wall seconds."""
    threads = threads or (os.cpu_count() or 1)
    return _run_timed([os.path.join(BIN, "count_kmer"), "-i", interleaved,
                       "-g", dump, "-o", out_gz, "-k", str(k),
                       "-l", str(min_len), "-w", str(window),
                       "-v", str(vector), "-t", str(threads)])


def run_count_kmer_paired(reads1: str, reads2: str, dump: str, out_gz: str,
                          *, k: int = 15, min_len: int = 2000,
                          window: int = 10, vector: int = 400,
                          threads: int = 0) -> float:
    """Reference count_kmer in paired -1/-2 mode (count_kmer.cpp:186-243;
    the mode whose global dump the reference quality-masks,
    src/feature.py:76-86)."""
    threads = threads or (os.cpu_count() or 1)
    return _run_timed([os.path.join(BIN, "count_kmer"), "-1", reads1,
                       "-2", reads2, "-g", dump, "-o", out_gz,
                       "-k", str(k), "-l", str(min_len), "-w", str(window),
                       "-v", str(vector), "-t", str(threads)])


def run_count_tnf(interleaved: str, out_gz: str, *, k: int = 4,
                  min_len: int = 2000, threads: int = 0) -> float:
    threads = threads or (os.cpu_count() or 1)
    return _run_timed([os.path.join(BIN, "count_tnf"), "-i", interleaved,
                       "-o", out_gz, "-k", str(k), "-l", str(min_len),
                       "-t", str(threads)])


def run_count_tnf_paired(reads1: str, reads2: str, out_gz: str, *,
                         k: int = 4, min_len: int = 2000,
                         threads: int = 0) -> float:
    threads = threads or (os.cpu_count() or 1)
    return _run_timed([os.path.join(BIN, "count_tnf"), "-1", reads1,
                       "-2", reads2, "-o", out_gz, "-k", str(k),
                       "-l", str(min_len), "-t", str(threads)])


def torch_train_seconds(abd, tnf, steps: int, *, batch: int = 2048,
                        hidden=(512, 512), latent: int = 32,
                        dropout: float = 0.2, lr: float = 0.005,
                        weight_decay: float = 1e-4, alpha: float = 0.1,
                        w_kl: float = 0.015, seed: int = 2021) -> float:
    """Time `steps` reference-style VAE train steps in torch on CPU.

    Mirrors src/models/VAENET.py:31-159: L1-normalized inputs, forward
    with reparameterized latent, wa·CE(abd)+wt·CE(tnf)+w_kl·KL loss,
    Adam(lr, weight_decay) update. One warmup step runs untimed.
    """
    import numpy as np
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 1)

    abd = np.asarray(abd, np.float32)
    tnf = np.asarray(tnf, np.float32)
    abd = abd / np.maximum(np.abs(abd).sum(1, keepdims=True), 1e-12)
    tnf = tnf / np.maximum(np.abs(tnf).sum(1, keepdims=True), 1e-12)
    abd_t = torch.tensor(abd)
    tnf_t = torch.tensor(tnf)
    abd_dim, tnf_dim = abd.shape[1], tnf.shape[1]
    in_dim = abd_dim + tnf_dim
    # loss weights exactly as VAENET.py:20-23
    wa = alpha * 100.0 / np.log(abd_dim)
    wt = (1.0 - alpha) * 100.0 / np.log(tnf_dim)
    w_kl = w_kl * 100.0 / latent

    def mlp(sizes):
        layers = []
        for i in range(len(sizes) - 1):
            layers += [nn.Linear(sizes[i], sizes[i + 1]),
                       nn.BatchNorm1d(sizes[i + 1]),
                       nn.LeakyReLU(True), nn.Dropout(dropout)]
        return nn.Sequential(*layers)

    class RefVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = mlp((in_dim,) + tuple(hidden))
            self.l_mu = nn.Linear(hidden[-1], latent)
            self.l_sigma = nn.Linear(hidden[-1], latent)
            self.decoder = mlp((latent,) + tuple(hidden[::-1]))
            self.output = nn.Linear(hidden[0], in_dim)

        def forward(self, a, t):
            h = self.encoder(torch.cat((a, t), 1))
            mu = self.l_mu(h)
            logsigma = F.softplus(self.l_sigma(h))
            z = mu + torch.randn_like(mu) * torch.exp(logsigma / 2)
            out = self.output(self.decoder(z))
            return (F.softmax(out[:, :abd_dim], 1),
                    F.softmax(out[:, abd_dim:], 1), mu, logsigma)

    model = RefVAE()
    opt = torch.optim.Adam(model.parameters(), lr=lr,
                           weight_decay=weight_decay)
    n = abd.shape[0]
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n, (steps + 1, min(batch, n)))
    eps = 1e-9

    def step(i):
        a, t = abd_t[idx[i]], tnf_t[idx[i]]
        ar, tr, mu, logsigma = model(a, t)
        ca = -(torch.log(ar + eps) * a).sum(-1).mean()
        ct = -(torch.log(tr + eps) * t).sum(-1).mean()
        kl = -0.5 * (1 + logsigma - mu.pow(2)
                     - logsigma.exp()).sum(-1).mean()
        loss = wa * ca + wt * ct + w_kl * kl
        opt.zero_grad()
        loss.backward()
        opt.step()

    step(0)  # warmup
    t0 = time.time()
    for i in range(1, steps + 1):
        step(i)
    return time.time() - t0
