"""Raw CRASH directory ingestion (`data/crash_raw.py`) against a synthetic
export tree with the reference's exact layout and .mat key conventions
(`/root/reference/Utils/CRASH_loader.py`)."""

import os
import pickle

import numpy as np
import pytest
import scipy.io as sio

from graph_wavenet_tpu.data import crash_raw
from graph_wavenet_tpu.data.crash import load_dataset_crash

R = 8          # regions
E = 4          # electrodes
T_F = 30       # fmri frames
T_E = 117      # eeg samples = 1 + (T_F - 1) * (2.0 / 0.5)


def _write_tree(root, subjects=("01", "02", "03"), sessions=(1, 2),
                seed=0):
    rng = np.random.default_rng(seed)
    sc_key = crash_raw.SC_KEY.format(R=R)
    for subj in subjects:
        for s in sessions:
            eeg_dir = os.path.join(root, "eeg", subj, f"ses-s{s}_task",
                                   "eeg")
            os.makedirs(eeg_dir, exist_ok=True)
            sio.savemat(os.path.join(eeg_dir, "data.mat"),
                        {"data": rng.standard_normal((E, T_E))})

            fdir = os.path.join(root, "fmri", "matfiles", "sub-" + subj,
                                f"ses-{s}")
            os.makedirs(fdir, exist_ok=True)
            # extra columns past R must be sliced off (util slices [:, :R])
            sio.savemat(os.path.join(fdir, f"sub_rest_{R}plus.mat"),
                        {"corrected_bold": rng.standard_normal((T_F, R + 2))})

            sdir = os.path.join(root, "sc", "sub-" + subj, f"ses-{s}")
            os.makedirs(sdir, exist_ok=True)
            w = rng.random((R + 1, R + 1))
            sio.savemat(os.path.join(sdir, f"conn_{R}plus.mat"),
                        {sc_key: w + w.T})

    # coordinate files for get_region_assignment
    mni = os.path.join(root, "sc", "Parcellations", "MNI")
    os.makedirs(mni, exist_ok=True)
    rows = []
    for label in range(1, R + 1):
        for _ in range(2):  # two voxels per parcel -> centroid is a mean
            x, y, z = rng.standard_normal(3) * 10
            rows.append([0, 0, 0, x, y, z, label])
    np.savetxt(os.path.join(
        mni, f"Schaefer2018_{R}Parcels_17Networks_order_FSLMNI152_2mm.txt"),
        np.asarray(rows))
    util_dir = os.path.join(root, "utils", "eeg_coor_conv")
    os.makedirs(util_dir, exist_ok=True)
    np.savetxt(os.path.join(util_dir, "ny_x_z"),
               np.c_[np.arange(E), rng.standard_normal((E, 3)) * 10])


def test_comn_ids_intersection(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    # subject with EEG only must be excluded; non-digit dirs ignored
    os.makedirs(os.path.join(root, "eeg", "99", "ses-s1_x", "eeg"))
    os.makedirs(os.path.join(root, "eeg", "notasubj"))
    os.makedirs(os.path.join(root, "fmri", "matfiles", "sub-xx"))
    assert crash_raw.get_comn_ids(root) == ["01", "02", "03"]


def test_loaders_shapes_keys_and_session_parse(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    ids = crash_raw.get_comn_ids(root)
    eeg = crash_raw.get_eeg(root, ids)
    fmri = crash_raw.get_fmri(root, ids, R)
    sc = crash_raw.get_sc(root, ids, R)

    assert eeg["time_res"] == pytest.approx(1 / 640.0)
    assert fmri["time_res"] == pytest.approx(0.910)
    # 'ses-s1_task' parses to session 1 (CRASH_loader.py:143 semantics)
    assert sorted(eeg["01"]) == [1, 2]
    assert sorted(fmri["01"]) == [1, 2]
    assert eeg["01"][1].shape == (E, T_E)
    assert fmri["01"][1].shape == (T_F, R)       # sliced from R+2 columns
    assert sc["01"][1].shape == (R, R)           # sliced from R+1


def test_common_sessions_filter(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    # an EEG-only extra session must be dropped by the intersection
    extra = os.path.join(root, "eeg", "01", "ses-s7_task", "eeg")
    os.makedirs(extra)
    sio.savemat(os.path.join(extra, "data.mat"),
                {"data": np.zeros((E, T_E))})
    ids = crash_raw.get_comn_ids(root)
    eeg = crash_raw.get_eeg(root, ids)
    fmri = crash_raw.get_fmri(root, ids, R)
    sc = crash_raw.get_sc(root, ids, R)
    assert 7 in eeg["01"]
    eeg, fmri, sc = crash_raw.common_sessions(eeg, fmri, sc, ids)
    assert sorted(eeg["01"]) == [1, 2]
    assert sorted(sc["01"]) == [1, 2]


def test_glob_one_rejects_ambiguity(tmp_path):
    root = str(tmp_path)
    _write_tree(root, subjects=("01",), sessions=(1,))
    sdir = os.path.join(root, "sc", "sub-01", "ses-1")
    sio.savemat(os.path.join(sdir, f"dup_{R}plus.mat"), {"x": np.zeros(1)})
    with pytest.raises(FileNotFoundError, match="exactly one sc file"):
        crash_raw.get_sc(root, ["01"], R)


def test_region_assignment_from_coordinate_files(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    assignment = crash_raw.get_region_assignment(root, R, k=3)
    assert sorted(assignment) == list(range(E))
    # every region lands on exactly k electrodes
    counts = np.zeros(R, int)
    for regions in assignment.values():
        for r in regions:
            counts[r] += 1
    assert (counts == 3).all()

    # verify one region against a hand computation (permuted eeg axes)
    coor_mri = np.loadtxt(os.path.join(
        root, "sc", "Parcellations", "MNI",
        f"Schaefer2018_{R}Parcels_17Networks_order_FSLMNI152_2mm.txt"),
        usecols=(3, 4, 5, 6))
    coor_eeg = np.loadtxt(os.path.join(root, "utils", "eeg_coor_conv",
                                       "ny_x_z"),
                          usecols=(1, 2, 3))[:, [1, 0, 2]]
    centroid = coor_mri[coor_mri[:, -1] == 1][:, :3].mean(0)
    nearest = np.argsort(np.linalg.norm(coor_eeg - centroid, axis=1))[:3]
    for e in nearest:
        assert 0 in assignment[int(e)]


def test_invert_assignment_roundtrip_and_errors(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    e2r = crash_raw.get_region_assignment(root, R, k=3)
    inv = crash_raw.invert_assignment(e2r, R)
    # region->electrodes: every region claimed by exactly the k electrodes
    # that listed it, sorted (reference util.py:399-404 semantics)
    assert sorted(inv) == list(range(R))
    for r, electrodes in inv.items():
        assert electrodes == sorted(electrodes)
        assert len(electrodes) == 3
        for e in electrodes:
            assert r in e2r[e]

    # a region no electrode claims is a hard error, not silent NaNs
    with pytest.raises(ValueError, match="no assigned electrode"):
        crash_raw.invert_assignment({0: [0], 1: [0]}, 3)
    # passing a region->electrodes map (regions as keys beyond num_region
    # as values) in the wrong direction is named explicitly
    with pytest.raises(ValueError, match="outside num_region"):
        crash_raw.invert_assignment({0: [5]}, 3)


@pytest.mark.slow
def test_cli_raw_mat_uses_real_assignment(tmp_path, capsys):
    """The raw-mat CLI branch must consume the coordinate files' real
    electrode-region geometry, not the synthetic ring layout (ADVICE r1)."""
    from graph_wavenet_tpu.cli import train as train_cli

    root = tmp_path / "raw"
    _write_tree(str(root))
    out = train_cli.main([
        "--data", "crash", "--crash_dir", str(root), "--crash_format",
        "mat", "--crash_num_region", str(R), "--fmri_time_res", "2.0",
        "--eeg_time_res", "0.5", "--nhid", "4", "--blocks", "2",
        "--layers", "2", "--batch_size", "4", "--epochs", "1",
        "--save", str(tmp_path / "g")])
    assert "assignment from coordinate files" in capsys.readouterr().out
    assert np.isfinite(out["result"].test_metrics["loss"])


def test_loader_warns_on_fpool_degradation(capsys):
    from graph_wavenet_tpu.data.crash import load_dataset_crash

    # F_t = 4.0 but 35's largest divisor <= 4 is 1 -> the warning must fire
    # and name a K multiple of ceil(F_t)
    load_dataset_crash(batch_size=2, fmri_time_res=2.0, eeg_time_res=0.5,
                       K=35)
    out = capsys.readouterr().out
    assert "F-pool factor degraded" in out
    assert "multiple of 4" in out


def test_fmri_bold_pools_voxels_per_region_per_frame(tmp_path):
    root = str(tmp_path)
    subj, sess = "01", 1
    func = os.path.join(root, "fmri", "matfiles", "sub-" + subj,
                        f"ses-{sess}", "func")
    os.makedirs(func)
    open(os.path.join(func, "0_sub-01_rest_bold_MNI_3mm.nii.gz"),
         "wb").close()  # placeholder; load_img below supplies the data

    rng = np.random.default_rng(1)
    ts = rng.standard_normal((3, 3, 2, 5))       # (x, y, z, T)
    atlas = rng.integers(0, 3, size=(3, 3, 2))   # labels 0 (bg), 1, 2
    bold = crash_raw.get_fmri_bold(root, [subj], atlas,
                                   load_img=lambda p: ts)
    assert bold["time_res"] == pytest.approx(0.910)
    out = bold[subj][sess]
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out[0], ts[atlas == 1].mean(0))
    np.testing.assert_allclose(out[1], ts[atlas == 2].mean(0))


def test_collect_records_and_full_pipeline(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    records = crash_raw.collect_records(root, num_region=R)
    assert len(records) == 6                     # 3 subjects x 2 sessions
    assert records[0].eeg.shape == (E, T_E)
    assert records[0].fmri.shape == (T_F, R)
    assert records[0].sc.shape == (R, R)

    # the raw tree drives the finished pipeline end-to-end
    data, supports, F_t, G = load_dataset_crash(
        batch_size=4, records=records, fmri_time_res=2.0, eeg_time_res=0.5)
    x, y, adj_idx = next(data["train_loader"].get_iterator())
    assert x.ndim == 4 and y.ndim == 4
    assert F_t >= 1


def test_export_pickles_roundtrip(tmp_path):
    root = str(tmp_path)
    _write_tree(root)
    out = crash_raw.export_pickles(root, str(tmp_path / "out"),
                                   num_region=R)
    assert sorted(out) == ["assignment", "eeg", "fmri", "sc"]
    with open(out["eeg"], "rb") as f:
        eeg = pickle.load(f)
    assert eeg["01"][1].shape == (E, T_E)
    with open(out["assignment"], "rb") as f:
        assignment = pickle.load(f)
    assert sorted(assignment) == list(range(E))


@pytest.mark.slow
def test_crash_cli_with_raw_mat_dir(tmp_path):
    from graph_wavenet_tpu.cli import train as train_cli

    root = tmp_path / "raw"
    _write_tree(str(root))
    out = train_cli.main([
        "--data", "crash", "--crash_dir", str(root), "--crash_format",
        "mat", "--crash_num_region", str(R), "--fmri_time_res", "2.0",
        "--eeg_time_res", "0.5", "--gcn_bool", "--addaptadj", "--randomadj",
        "--nhid", "4", "--blocks", "2", "--layers", "2", "--batch_size",
        "4", "--epochs", "1", "--save", str(tmp_path / "g")])
    assert np.isfinite(out["result"].test_metrics["loss"])


def test_crash_cli_rejects_empty_raw_dir(tmp_path):
    from graph_wavenet_tpu.cli import train as train_cli

    root = tmp_path / "empty"
    root.mkdir()
    with pytest.raises(SystemExit, match="no complete CRASH records"):
        train_cli.main([
            "--data", "crash", "--crash_dir", str(root),
            "--epochs", "1", "--save", str(tmp_path / "g")])
