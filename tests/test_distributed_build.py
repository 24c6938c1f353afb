"""Distributed matrix build: 1-process equivalence + real 2-process run.

The 2-process test launches two OS processes with jax.distributed over a
localhost coordinator (the CI stand-in for an N-host pod slice,
SURVEY.md section 4 item 4) and asserts the matrix is identical to the
single-process build.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from grm_tpu.kmer.counter import count_fasta
from grm_tpu.kmer.matrix import build_presence_matrix
from grm_tpu.parallel.build import build_presence_matrix_distributed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_genomes(tmp_path, rng, n=6):
    specs = []
    for i in range(n):
        gid = "d%02d" % i
        p = tmp_path / ("%s.fna" % gid)
        p.write_text(">c\n%s\n" % "".join(rng.choice(list("ACGT"), 300)))
        specs.append((gid, str(p)))
    return specs


def test_single_process_equals_local(tmp_path, rng):
    specs = _make_genomes(tmp_path, rng)
    k = 13
    km_dist = build_presence_matrix_distributed(specs, k)
    gks = [count_fasta(p, k, genome_id=gid) for gid, p in specs]
    km_local = build_presence_matrix(gks)
    np.testing.assert_array_equal(km_dist.kmers, km_local.kmers)
    np.testing.assert_array_equal(km_dist.matrix, km_local.matrix)
    assert km_dist.genome_ids == km_local.genome_ids


def test_single_process_singleton_filter(tmp_path, rng):
    specs = _make_genomes(tmp_path, rng)
    k = 9
    km_dist = build_presence_matrix_distributed(specs, k, filter_singleton=True)
    gks = [count_fasta(p, k, genome_id=gid) for gid, p in specs]
    km_local = build_presence_matrix(gks, filter_singleton=True)
    np.testing.assert_array_equal(km_dist.kmers, km_local.kmers)
    np.testing.assert_array_equal(km_dist.matrix, km_local.matrix)


_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, %(repo)r)

from grm_tpu.parallel.distributed import initialize
initialize(coordinator_address=%(coord)r, num_processes=2,
           process_id=int(sys.argv[1]))

from grm_tpu.parallel.build import build_presence_matrix_distributed
specs = %(specs)r
km = build_presence_matrix_distributed(specs, %(k)d)
np.save(%(out)r + sys.argv[1] + "_kmers.npy", km.kmers)
np.save(%(out)r + sys.argv[1] + "_matrix.npy", km.matrix)
"""


@pytest.mark.slow
def test_two_process_build_matches_local(tmp_path, rng):
    specs = _make_genomes(tmp_path, rng, n=5)
    k = 11

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port
    out_prefix = str(tmp_path / "proc_")

    script = _WORKER % {
        "repo": REPO, "coord": coord, "specs": specs, "k": k,
        "out": out_prefix,
    }
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # virtual devices confuse multi-process init
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    gks = [count_fasta(p, k, genome_id=gid) for gid, p in specs]
    km_local = build_presence_matrix(gks)
    for pid in range(2):
        kmers = np.load(out_prefix + "%d_kmers.npy" % pid)
        matrix = np.load(out_prefix + "%d_matrix.npy" % pid)
        np.testing.assert_array_equal(kmers, km_local.kmers)
        np.testing.assert_array_equal(matrix, km_local.matrix)
