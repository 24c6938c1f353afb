"""Offline (mock-FTP) tests of the PATRIC download paths.

VERDICT r2 item 10: the download / cancel / .part-cleanup logic of
``collect/patric.py`` (reference behavior: src/app.py:529-799, 651-657,
3074-3166) exercised against an in-process fake FTP server — no network.
"""

import os
import threading
from ftplib import error_temp

import pytest

import grm_tpu.collect.patric as patric


class FakeFTP:
    """Minimal ftplib.FTP stand-in serving from a class-level dict."""

    files = {}
    fail_paths = set()
    connections = []

    def __init__(self, host, timeout=None):
        self.host = host
        type(self).connections.append(self)

    def login(self):
        pass

    def sendcmd(self, cmd):
        assert cmd.startswith("MDTM ")
        return "213 20260812093000"

    def size(self, path):
        return len(self.files[path])

    def retrbinary(self, cmd, callback, blocksize=8192):
        path = cmd.split(" ", 1)[1]
        if path in self.fail_paths:
            callback(b"PARTIAL")  # some bytes land before the failure
            raise error_temp("426 Connection closed; transfer aborted.")
        if path not in self.files:
            raise error_temp("550 %s: No such file" % path)
        data = self.files[path]
        for i in range(0, len(data), 4):
            callback(data[i:i + 4])

    def quit(self):
        pass


@pytest.fixture
def fake_ftp(monkeypatch):
    FakeFTP.files = {}
    FakeFTP.fail_paths = set()
    FakeFTP.connections = []
    monkeypatch.setattr(patric, "FTP", FakeFTP)
    return FakeFTP


def test_amr_metadata_download_and_mdtm(tmp_path, fake_ftp):
    fake_ftp.files[patric.AMR_METADATA_PATH] = b"genome_id\tantibiotic\n1\tamp\n"
    seen = []
    local = patric.download_amr_metadata(
        tmp_path, progress_callback=lambda t, p: seen.append((t, p)))
    assert open(local, "rb").read() == fake_ftp.files[patric.AMR_METADATA_PATH]
    assert not os.path.exists(local + ".part")
    assert seen and seen[-1][1] == 1.0
    assert patric.remote_amr_metadata_mdtm() == "20260812093000"


def test_amr_metadata_failure_cleans_partial(tmp_path, fake_ftp):
    fake_ftp.files[patric.AMR_METADATA_PATH] = b"data"
    fake_ftp.fail_paths.add(patric.AMR_METADATA_PATH)
    with pytest.raises(error_temp):
        patric.download_amr_metadata(tmp_path)
    assert os.listdir(tmp_path) == []  # no .part, no final file


def test_download_genomes_success_and_per_genome_errors(tmp_path, fake_ftp):
    for gid in ("11.1", "22.2"):
        fake_ftp.files["genomes/%s/%s.fna" % (gid, gid)] = (
            b">c\nACGT" + gid.encode() + b"\n")
        fake_ftp.files["genomes/%s/%s.PATRIC.features.tab" % (gid, gid)] = (
            b"feat\t" + gid.encode())
    # 33.3 exists but its transfer breaks mid-flight; 44.4 doesn't exist
    fake_ftp.files["genomes/33.3/33.3.fna"] = b">c\nAAAA\n"
    fake_ftp.fail_paths.add("genomes/33.3/33.3.fna")

    results, errors = patric.download_genomes(
        ["11.1", "22.2", "33.3", "44.4"], tmp_path, features=True)
    assert set(results) == {"11.1", "22.2"}
    assert set(errors) == {"33.3", "44.4"}
    for gid in ("11.1", "22.2"):
        fna = os.path.join(tmp_path, gid + ".fna")
        tab = os.path.join(tmp_path, gid + ".PATRIC.features.tab")
        assert results[gid] == [fna, tab]
        assert open(fna, "rb").read() == fake_ftp.files[
            "genomes/%s/%s.fna" % (gid, gid)]
    # Failed transfers leave no partial files behind (app.py:651-657).
    leftovers = [f for f in os.listdir(tmp_path) if ".part" in f
                 or f.startswith(("33.3", "44.4"))]
    assert leftovers == []


def test_download_genomes_cancel_stops_early(tmp_path, fake_ftp):
    gids = ["%d.0" % i for i in range(30)]
    for gid in gids:
        fake_ftp.files["genomes/%s/%s.fna" % (gid, gid)] = b">c\nACGT\n"
    cancel = threading.Event()
    n_seen = []

    def progress(task, p):
        n_seen.append(p)
        cancel.set()  # cancel after the first completion lands

    results, errors = patric.download_genomes(
        gids, tmp_path, progress_callback=progress, cancel_event=cancel)
    # The loop stopped before consuming every completion.
    assert len(results) + len(errors) < len(gids)
    assert not errors
