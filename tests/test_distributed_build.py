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


_LEARN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
import numpy as np
sys.path.insert(0, %(repo)r)

from grm_tpu.parallel.distributed import initialize
initialize(coordinator_address=%(coord)r, num_processes=2,
           process_id=int(sys.argv[1]))
assert jax.device_count() == 8, jax.device_count()

from grm_tpu.parallel.mesh import make_mesh
from grm_tpu.parallel.scm_grid import scm_cv_grid_sharded

data = np.load(%(data)r)
mesh = make_mesh(8, row_devices=1)
fits = []
for i in range(data["n_fits"]):
    fits.append({
        "pos_mask": data["pos"][i], "neg_mask": data["neg"][i],
        "test_pos_mask": data["tpos"][i], "test_neg_mask": data["tneg"][i],
        "p": float(data["ps"][i]),
        "model_type": "disjunction" if data["is_disj"][i] else "conjunction",
    })
rules, n_rules, risks = scm_cv_grid_sharded(
    data["matrix"], fits, int(data["n_kmers"]), 4, mesh)
np.savez(%(out)r + sys.argv[1] + ".npz", rules=rules, n_rules=n_rules,
         risks=risks)
"""


@pytest.mark.slow
def test_two_process_sharded_learn_matches_local(tmp_path, rng):
    """2-process (multi-host stand-in) column-sharded CV grid == the
    single-process scan engine, on an 8-device global mesh (4 per process).
    """
    from grm_tpu.parallel.scm_device import build_packed_mask, scm_cv_batch_device
    from grm_tpu.utils import pack_binary_bytes_to_ints

    n_genomes, n_kmers = 60, 517
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    w = packed.shape[0]

    from helpers_scm import make_cv_fits

    fits = make_cv_fits(y, n_genomes, w, ps=(0.5, 2.0), n_folds=2)

    data_path = str(tmp_path / "learn_inputs.npz")
    np.savez(
        data_path, matrix=packed, n_kmers=n_kmers, n_fits=len(fits),
        pos=np.stack([f["pos_mask"] for f in fits]),
        neg=np.stack([f["neg_mask"] for f in fits]),
        tpos=np.stack([f["test_pos_mask"] for f in fits]),
        tneg=np.stack([f["test_neg_mask"] for f in fits]),
        ps=np.array([f["p"] for f in fits], np.float32),
        is_disj=np.array(
            [f["model_type"] == "disjunction" for f in fits], bool),
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port
    out_prefix = str(tmp_path / "learn_")

    script = _LEARN_WORKER % {
        "repo": REPO, "coord": coord, "data": data_path, "out": out_prefix,
    }
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    r_scan, n_scan, k_scan = scm_cv_batch_device(packed, fits, n_kmers, 4)
    for pid in range(2):
        got = np.load(out_prefix + "%d.npz" % pid)
        np.testing.assert_array_equal(got["rules"], r_scan)
        np.testing.assert_array_equal(got["n_rules"], n_scan)
        np.testing.assert_allclose(got["risks"], k_scan, atol=1e-6)


_FAULT_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, %(repo)r)

from grm_tpu.parallel.distributed import initialize
initialize(coordinator_address=%(coord)r, num_processes=2,
           process_id=int(sys.argv[1]))

from grm_tpu.parallel.build import build_presence_matrix_distributed
specs_by_rank = %(specs_by_rank)r
try:
    build_presence_matrix_distributed(specs_by_rank[int(sys.argv[1])], %(k)d)
except Exception as e:
    sys.stderr.write("GRM_FAULT: %%s\n" %% e)
    sys.stderr.flush()
    # Hard exit: jax.distributed's atexit shutdown barrier would block on
    # the (possibly dead or diverged) peer — a faulted worker must not hang
    # its own exit path.
    os._exit(3)
sys.exit(0)
"""


def _launch_fault_workers(tmp_path, specs_by_rank, k):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port
    script = _FAULT_WORKER % {
        "repo": REPO, "coord": coord, "specs_by_rank": specs_by_rank, "k": k,
    }
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    return [
        subprocess.Popen([sys.executable, "-c", script, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)
    ]


@pytest.mark.slow
def test_two_process_build_genome_list_mismatch_fails_fast(tmp_path, rng):
    """VERDICT r2 item 7: a mismatched genome list across processes must
    produce a clean, diagnosable error on EVERY rank — not a hang or a
    silently diverged matrix."""
    specs = _make_genomes(tmp_path, rng, n=4)
    mismatched = list(specs)
    mismatched[2] = ("zz_other", mismatched[2][1])  # rank-1 disagrees
    procs = _launch_fault_workers(tmp_path, [specs, mismatched], k=11)
    outs = [p.communicate(timeout=180) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 3, (p.returncode, se.decode()[-1500:])
        assert b"GRM_FAULT" in se
        assert b"input mismatch" in se


@pytest.mark.slow
def test_two_process_build_failing_process_surfaces_error(tmp_path, rng):
    """A process whose input is unreadable must exit with a clean error
    carrying the cause (the reference's rc-surfacing posture,
    src/app.py:1326-1337); the peer must not be left running."""
    specs = _make_genomes(tmp_path, rng, n=4)
    broken = list(specs)
    # round-robin: rank 1 owns genome indices 1 and 3
    broken[1] = (broken[1][0], str(tmp_path / "missing.fna"))
    procs = _launch_fault_workers(tmp_path, [broken, broken], k=11)
    # Rank 1 must fail fast with the bad path in its message.
    out1 = procs[1].communicate(timeout=180)
    assert procs[1].returncode == 3, out1[1].decode()[-1500:]
    assert b"GRM_FAULT" in out1[1]
    assert b"missing.fna" in out1[1]
    # Rank 0 is now blocked in the union exchange with a dead peer; the
    # orchestrator's job is to reap it (reference posture). Do so and
    # assert it had NOT produced a matrix.
    try:
        procs[0].communicate(timeout=10)
        survived = True
    except subprocess.TimeoutExpired:
        survived = False
        procs[0].kill()
        procs[0].communicate()
    if survived:
        assert procs[0].returncode != 0


_MULTIAXIS_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
import numpy as np
sys.path.insert(0, %(repo)r)

from grm_tpu.parallel.distributed import initialize
initialize(coordinator_address=%(coord)r, num_processes=4,
           process_id=int(sys.argv[1]))
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 2

from grm_tpu.parallel.mesh import (make_mesh, scm_device_step,
                                   shard_bit_matrix)

data = np.load(%(data)r)
packed = data["matrix"]
n_kmers = int(data["n_kmers"])
# (2, 4) mesh: the rows axis spans the process 0/1 vs 2/3 boundary and
# the cols axis crosses processes within each row — both mesh axes cut
# across process boundaries (the N-host story beyond N=2).
mesh = make_mesh(8, row_devices=2)
matrix, k = shard_bit_matrix(packed, mesh)
pos_mask = data["pos_mask"].copy()
neg_mask = data["neg_mask"].copy()
from jax.experimental import multihost_utils
chosen = []
for _ in range(3):
    best, util, pos_mask, neg_mask, n_neg = scm_device_step(
        matrix, pos_mask, neg_mask, 1.0, k)
    # Step outputs carry the row sharding; gather them to host values so
    # the next step (and the scalar reads) work from every process.
    pos_mask = np.asarray(multihost_utils.process_allgather(
        pos_mask, tiled=True))
    neg_mask = np.asarray(multihost_utils.process_allgather(
        neg_mask, tiled=True))
    import jax.numpy as jnp
    best = int(np.asarray(multihost_utils.process_allgather(
        jnp.reshape(best, (1,)), tiled=True))[0])
    n_neg = int(np.asarray(multihost_utils.process_allgather(
        jnp.reshape(n_neg, (1,)), tiled=True))[0])
    chosen.append(best)
    if n_neg == 0:
        break
np.save(%(out)r + sys.argv[1] + ".npy", np.array(chosen))
"""


@pytest.mark.slow
def test_four_process_multiaxis_mesh_learn_matches_local(tmp_path, rng):
    """4 processes x 2 devices on a (2, 4) ("rows", "cols") mesh — both
    axes cross process boundaries — must reproduce the single-process
    8-device greedy selection exactly (VERDICT r3 item 8)."""
    from grm_tpu.parallel.mesh import (make_mesh, scm_device_step,
                                       shard_bit_matrix)
    from grm_tpu.utils import build_row_mask, pack_binary_bytes_to_ints

    n_genomes, n_kmers = 60, 517
    dense = (rng.rand(n_genomes, n_kmers) > 0.6).astype(np.uint8)
    y = (rng.rand(n_genomes) > 0.5).astype(np.uint8)
    packed = pack_binary_bytes_to_ints(dense, 32)
    w = packed.shape[0]

    pos_mask = np.zeros(w, np.uint32)
    neg_mask = np.zeros(w, np.uint32)
    pm = build_row_mask(np.where(y == 1)[0], n_genomes, 32)
    nm = build_row_mask(np.where(y == 0)[0], n_genomes, 32)
    pos_mask[: len(pm)] = pm
    neg_mask[: len(nm)] = nm

    data_path = str(tmp_path / "ma_inputs.npz")
    np.savez(data_path, matrix=packed, n_kmers=n_kmers,
             pos_mask=pos_mask, neg_mask=neg_mask)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port
    out_prefix = str(tmp_path / "ma_")

    script = _MULTIAXIS_WORKER % {
        "repo": REPO, "coord": coord, "data": data_path, "out": out_prefix,
    }
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(4)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    # Single-process expected path on the same (2, 4) mesh shape.
    mesh = make_mesh(8, row_devices=2)
    matrix, k = shard_bit_matrix(packed, mesh)
    pm_l, nm_l = pos_mask.copy(), neg_mask.copy()
    expected = []
    for _ in range(3):
        best, util, pm_l, nm_l, n_neg = scm_device_step(
            matrix, pm_l, nm_l, 1.0, k)
        expected.append(int(best))
        if int(n_neg) == 0:
            break

    for pid in range(4):
        got = np.load(out_prefix + "%d.npy" % pid).tolist()
        assert got == expected, (pid, got, expected)
