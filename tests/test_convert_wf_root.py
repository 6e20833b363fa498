"""convert_wf_to_root exercised against a stubbed uproot module.

The inverse bridge (WF .npz -> the reference consumers' ROOT file,
ref TEST_2.C:1383-1432) is tested by injecting a fake writable ``uproot``
into sys.modules. Covers: the 17-branch WF tree content in
(runnum, evt)-sorted order, jagged wfampl/wftime/h1time/h2time
reconstruction, the restored T tree (flat + ragged payload), restored
histograms and scalar parameters, and a full pipeline round trip
(npz -> root-stub -> column equality).
"""
import sys
import types

import numpy as np
import pytest

from npswf_tpu.io.writer import WFWriter, read_wf


class FakeWritableFile:
    def __init__(self):
        self.written = {}

    def __setitem__(self, key, value):
        self.written[key] = value

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.fixture()
def stub_uproot(monkeypatch):
    files = {}

    def recreate(path):
        f = FakeWritableFile()
        files[path] = f
        return f

    stub = types.ModuleType("uproot")
    stub.recreate = recreate
    monkeypatch.setitem(sys.modules, "uproot", stub)
    return files


def _make_wf_file(tmp_path, small_cfg, small_cal, payload=None):
    """Run the real pipeline on a few synthetic events and write a WF file."""
    import jax.numpy as jnp
    from npswf_tpu.engine.pipeline import EventBatch, process_batch
    from npswf_tpu.io.decode import DecodedBatch
    from npswf_tpu.utils.synthetic import make_events
    cfg = small_cfg
    E, B = 5, cfg.nblocks
    truth = make_events(cfg, small_cal, E, occupancy=0.3, seed=31)
    batch = EventBatch(signal=jnp.asarray(truth.signal),
                       pres=jnp.asarray(truth.pres.astype(bool)),
                       corr_time_HMS=jnp.asarray(np.linspace(-1, 1, E)),
                       evt=jnp.asarray(np.asarray([5, 3, 4, 1, 2])),
                       runnum=jnp.full(E, 3000))
    calib = {k: jnp.asarray(v) for k, v in
             small_cal.device_arrays(cfg).items()}
    out = process_batch(cfg, calib, batch)
    zeros = np.zeros((E, B))
    pres_slots = np.zeros((E, cfg.nslots), np.int32)
    pres_slots[:, :B] = truth.pres
    decoded = DecodedBatch(
        signal=truth.signal, pres=pres_slots,
        minsignal=truth.signal.min(axis=2),
        corr_time_HMS=np.asarray(batch.corr_time_HMS),
        sampampl=zeros, samptime=zeros, sampener=zeros, sampped=zeros,
        hcana_npulse=zeros,
        evt=np.asarray([5, 3, 4, 1, 2], np.int64),
        runnum=np.full(E, 3000, np.int64),
        bad_slot=np.full(E, -1, np.int64))
    w = WFWriter(cfg, payload=dict(payload or {}))
    w.add_batch(out, decoded)
    path = str(tmp_path / "wf.npz")
    w.finalize(path)
    return path, out, decoded


def test_wf_tree_round_trip_sorted(stub_uproot, tmp_path, small_cfg, small_cal):
    from npswf_tpu.tools.convert_wf_to_root import convert, REFERENCE_BRANCHES
    path, out, decoded = _make_wf_file(tmp_path, small_cfg, small_cal)
    root_path = str(tmp_path / "out.root")
    n = convert(path, root_path)
    assert n == 5
    written = stub_uproot[root_path].written
    wf_tree = written["WF"]
    for b in REFERENCE_BRANCHES:
        assert b in wf_tree, f"missing reference branch {b}"
    # rows come out (runnum, evt)-sorted: evt must read 1..5
    np.testing.assert_array_equal(wf_tree["evt"], [1.0, 2.0, 3.0, 4.0, 5.0])
    assert wf_tree["evt"].dtype == np.float64
    # per-block vector branches permuted consistently: row of evt=5 is the
    # writer's row 0
    wf = read_wf(path)
    order = wf["sort_order"]
    np.testing.assert_allclose(np.asarray(wf_tree["chi2"]),
                               wf["chi2"][order], atol=0)
    np.testing.assert_array_equal(np.asarray(wf_tree["wfnpulse"]),
                                  wf["wfnpulse"][order])
    # jagged wfampl/wftime: per-row lengths equal the row's total pulse count
    for i, row in enumerate(order):
        lo, hi = wf["wf_offsets"][row], wf["wf_offsets"][row + 1]
        np.testing.assert_allclose(wf_tree["wfampl"][i],
                                   wf["wfampl_flat"][lo:hi], atol=0)
        np.testing.assert_allclose(wf_tree["wftime"][i],
                                   wf["wftime_flat"][lo:hi], atol=0)
        assert len(wf_tree["wfampl"][i]) == int(wf["wfnpulse"][row].sum())
    # histograms restored with the booked binning (ref :533-534)
    h1 = written["h1time"]
    assert h1[0].shape[0] == 200 and h1[1][0] == -50.0 and h1[1][-1] == 50.0


def test_payload_restoration(stub_uproot, tmp_path, small_cfg, small_cal):
    from npswf_tpu.tools.convert_wf_to_root import convert
    flat = np.arange(5.0)
    ragged = np.asarray([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    offsets = np.asarray([0, 2, 3, 3, 5, 6], np.int64)
    payload = {
        "T.g.trigtype": flat,
        "T.NPS.cal.fly.block_clusterID": ragged,
        "T.NPS.cal.fly.block_clusterID__offsets": offsets,
        "obj.hZClus__values": np.arange(4.0),
        "obj.hZClus__edges": np.linspace(0, 1, 5),
        "obj.runParam": np.asarray([3.14]),
        "__unrepresentable": np.asarray(["canvas1"]),
    }
    path, *_ = _make_wf_file(tmp_path, small_cfg, small_cal, payload=payload)
    root_path = str(tmp_path / "out2.root")
    convert(path, root_path)
    written = stub_uproot[root_path].written
    # T tree in ORIGINAL (unsorted) order — it is a clone of the input
    t = written["T"]
    np.testing.assert_allclose(t["g.trigtype"], flat, atol=0)
    assert [len(x) for x in t["NPS.cal.fly.block_clusterID"]] == [2, 1, 0, 2, 1]
    np.testing.assert_allclose(np.concatenate(
        list(t["NPS.cal.fly.block_clusterID"])), ragged, atol=0)
    # histogram object restored as a (values, edges) tuple
    hv, he = written["hZClus"]
    np.testing.assert_allclose(hv, np.arange(4.0))
    np.testing.assert_allclose(he, np.linspace(0, 1, 5))
    # scalar parameter restored through the params tree
    np.testing.assert_allclose(written["params"]["runParam"], [3.14])


def test_empty_wf_file_converts(stub_uproot, tmp_path):
    from npswf_tpu.io.writer import write_empty_wf
    from npswf_tpu.tools.convert_wf_to_root import convert, REFERENCE_BRANCHES
    path = str(tmp_path / "empty.npz")
    write_empty_wf(path)
    root_path = str(tmp_path / "empty.root")
    assert convert(path, root_path) == 0
    wf_tree = stub_uproot[root_path].written["WF"]
    for b in REFERENCE_BRANCHES:
        assert b in wf_tree
        assert len(wf_tree[b]) == 0
