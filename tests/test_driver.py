"""End-to-end orchestration tests with dummy backends (splib_test
equivalent, /root/reference/splib/test/splib_test.py) plus spifs.nc IO."""

import os

import numpy as np
import pytest

from sp_coupler_tpu.config import SPConfig
from sp_coupler_tpu.utils import geometry
from sp_coupler_tpu.runtime.driver import SPRunner
from sp_coupler_tpu.io import spifs, h5nc


def dummy_cfg(tmp_path, **kw):
    base = dict(gcm_type="dummy", les_type="dummy",
                output_dir=str(tmp_path / "out"))
    base.update(kw)
    return SPConfig(**base)


class TestH5NC:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.nc")
        ds = h5nc.Dataset(path, "w")
        ds.createDimension("z", 5)
        ds.createDimension("Time", None)
        v = ds.createVariable("T", "f4", ("Time", "z"))
        v.units = "K"
        v[0] = np.arange(5.0)
        v[1] = np.arange(5.0) * 2
        g = ds.createGroup("12")
        gv = g.createVariable("x", "f4", ("Time",))
        gv[0] = 3.5
        ds.close()
        r = h5nc.Dataset(path, "r")
        assert r.dimensions["z"] == 5
        np.testing.assert_allclose(r.variables["T"][1], np.arange(5.0) * 2)
        assert r.variables["T"].units == b"K" or r.variables["T"].units == "K"
        assert float(r.groups["12"].variables["x"][0]) == 3.5
        r.close()

    def test_append_mode(self, tmp_path):
        path = str(tmp_path / "t.nc")
        ds = h5nc.Dataset(path, "w")
        ds.createDimension("Time", None)
        v = ds.createVariable("Time", "f4", ("Time",))
        v[0] = 1.0
        ds.close()
        ds2 = h5nc.Dataset(path, "a")
        tv = ds2.variables["Time"]
        tv[1] = 2.0
        ds2.close()
        r = h5nc.Dataset(path, "r")
        np.testing.assert_allclose(r.variables["Time"][:], [1.0, 2.0])
        r.close()


class TestDummyLoop:
    def test_initialize_run_finalize(self, tmp_path):
        cfg = dummy_cfg(tmp_path)
        # two point geometries -> two SP columns (dummy grid 40x20)
        geoms = [geometry.Point((45.0, 10.0)), geometry.Point((90.0, -30.0))]
        r = SPRunner(cfg, geoms)
        r.initialize()
        assert len(r.sp_cols) == 2
        r.run(5)
        r.finalize()
        # verify output structure
        ds = spifs.open_reader(cfg.output_path)
        assert len(ds.variables["Time"][:]) == 5
        for col in r.sp_cols:
            g = ds.groups[str(col)]
            T = np.asarray(g.variables["T"][:])
            assert T.shape == (5, 20)
            assert np.all(np.isfinite(T[1:]))
            thl = np.asarray(g.variables["thl"][:])
            assert thl.shape[1] == 20  # dummy LES has 20 levels
            fU = np.asarray(g.variables["f_U"][:])
            assert fU.shape == (5, 20)
        ds.close()
        # timing file exists with header + 5 lines
        lines = open(os.path.join(cfg.output_dir, "timing.txt")).readlines()
        assert lines[0].startswith("# LES grid points")
        assert len([ln for ln in lines if not ln.startswith("#")]) == 5 + 1

    def test_output_columns(self, tmp_path):
        cfg = dummy_cfg(tmp_path)
        geoms = [geometry.Point((45.0, 10.0))]
        out_geoms = [geometry.Point((200.0, 40.0))]
        r = SPRunner(cfg, geoms, out_geoms)
        r.initialize()
        assert len(r.output_cols) == 1
        r.run(2)
        r.finalize()
        ds = spifs.open_reader(cfg.output_path)
        g = ds.groups[str(r.output_cols[0])]
        assert "T" in g.variables
        assert "thl" not in g.variables  # output-only columns have no LES vars
        assert np.isfinite(np.asarray(g.variables["T"][1])).all()
        ds.close()

    def test_existing_output_dir_rejected(self, tmp_path):
        """Non-empty output dirs are refused (clobber guard,
        splib.py:101-102); an EMPTY dir is fine — a sibling process of a
        multi-controller run may have created it."""
        cfg = dummy_cfg(tmp_path)
        os.makedirs(cfg.output_dir)
        with open(os.path.join(cfg.output_dir, "old.nc"), "w") as f:
            f.write("x")
        r = SPRunner(cfg, [geometry.Point((45.0, 10.0))])
        with pytest.raises(RuntimeError):
            r.initialize()

    def test_dryrun(self, tmp_path):
        cfg = dummy_cfg(tmp_path, dryrun=True)
        r = SPRunner(cfg, [geometry.Point((45.0, 10.0))])
        r.initialize()
        pts = np.loadtxt(os.path.join(cfg.output_dir, "gridpoints.txt"))
        assert pts.shape == (800, 2)  # 40 x 20 dummy grid

    def test_no_sp_columns(self, tmp_path):
        cfg = dummy_cfg(tmp_path)
        r = SPRunner(cfg, [])
        r.initialize()
        r.run(2)
        r.finalize()


class TestNativeSmallLoop:
    """Small native GCM + native LES coupled loop: the real end-to-end path."""

    @pytest.mark.slow   # near-duplicate of test_fused_path_active's
    # native-native loop; that one stays fast
    def test_two_steps(self, tmp_path):
        cfg = SPConfig(gcm_type="sptpu", les_type="sptpu",
                       gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                       les_itot=16, les_jtot=16, les_ktot=24,
                       les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                       les_dt=5.0,
                       output_dir=str(tmp_path / "out"))
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        assert len(r.sp_cols) == 1
        r.run(2)
        r.finalize()
        ds = spifs.open_reader(cfg.output_path)
        g = ds.groups[str(r.sp_cols[0])]
        thl = np.asarray(g.variables["thl"][:])
        assert thl.shape == (2, 24)
        assert np.all(np.isfinite(thl))
        assert np.all(thl > 200.0) and np.all(thl < 400.0)
        fT = np.asarray(g.variables["f_T"][:])
        assert np.all(np.isfinite(fT))
        rain = np.asarray(g.variables["rain"][:])
        assert np.all(rain >= 0.0)
        ds.close()


class TestFusedPath:
    def _cfg(self, tmp_path, **kw):
        from sp_coupler_tpu.config import SPConfig
        base = dict(gcm_type="sptpu", les_type="sptpu",
                    gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                    les_itot=16, les_jtot=16, les_ktot=24,
                    les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                    les_dt=5.0, output_dir=str(tmp_path / "out"))
        base.update(kw)
        return SPConfig(**base)

    def test_fused_path_active(self, tmp_path):
        r = SPRunner(self._cfg(tmp_path), [geometry.Point((300.0, 15.0))])
        r.initialize()
        assert r.coupled is not None  # native-native uses the fused program
        r.run(2)
        r.finalize()
        ds = spifs.open_reader(r.cfg.output_path)
        g = ds.groups[str(r.sp_cols[0])]
        for var in ("thl", "f_T", "A_d", "rain", "t", "qr", "Psurf"):
            arr = np.asarray(g.variables[var][:])
            assert arr.shape[0] == 2 and np.all(np.isfinite(arr)), var
        ds.close()

    @pytest.mark.slow   # spinup leg; the fused path itself stays fast
    def test_spinup_then_fused(self, tmp_path):
        cfg = self._cfg(tmp_path, les_spinup=60.0, les_spinup_steps=2)
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        r.run(2)
        r.finalize()
        ds = spifs.open_reader(cfg.output_path)
        # 2 spinup records + 2 coupled records
        assert len(ds.variables["Time"][:]) == 4
        thl = np.asarray(ds.groups[str(r.sp_cols[0])].variables["thl"][:])
        assert np.all(np.isfinite(thl))
        ds.close()

    @pytest.mark.slow   # mesh topology e2e; sharding correctness stays
    # fast in test_parallel.py
    def test_meshed_run(self, tmp_path):
        """--mesh_les/--lesprocs topology: fleet sharded over the 8 virtual
        devices (les=2 instances x 2x2 intra-LES decomposition)."""
        cfg = self._cfg(tmp_path, mesh_les=2, les_num_procs=4,
                        max_num_les=2)
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        assert r.mesh is not None
        assert dict(r.mesh.shape) == {"les": 2, "x": 2, "y": 2}
        assert len(r.sp_cols) == 2
        r.run(2)
        r.finalize()
        ds = spifs.open_reader(cfg.output_path)
        for col in r.sp_cols:
            thl = np.asarray(ds.groups[str(col)].variables["thl"][:])
            assert thl.shape == (2, 24) and np.all(np.isfinite(thl))
        ds.close()

    @pytest.mark.slow   # periodic-checkpoint leg; restart_roundtrip stays fast
    def test_periodic_restart(self, tmp_path):
        """restart_steps=1 writes a checkpoint after every coupled step
        (reference: OpenIFS restart_steps / DALES trestart scheduling)."""
        import os
        from sp_coupler_tpu.io import restart as restart_io
        cfg = self._cfg(tmp_path, restart_steps=1)
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        path = os.path.join(cfg.output_dir, restart_io.FNAME)
        r.run(1)
        assert os.path.exists(path)
        mtime1 = os.path.getmtime(path)
        r.run(1)
        assert os.path.getmtime(path) >= mtime1
        step_saved = r.gcm.step_count
        r.finalize(save_restart=False)
        # the checkpoint resumes with the saved GCM step counter
        cfg2 = cfg.replace(restart=True)
        r2 = SPRunner(cfg2, [geometry.Point((300.0, 15.0))])
        r2.initialize()
        assert r2.gcm.step_count == step_saved
        r2.finalize(save_restart=False)

    def test_restart_roundtrip(self, tmp_path):
        cfg = self._cfg(tmp_path)
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        r.run(2)
        r.finalize(save_restart=True)
        t_end = r.gcm.get_model_time()
        # resume
        cfg2 = cfg.replace(restart=True)
        r2 = SPRunner(cfg2, [geometry.Point((300.0, 15.0))])
        r2.initialize()
        assert r2.gcm.get_model_time() == t_end
        r2.run(2)  # one overlap step (not written) + one real step
        r2.finalize(save_restart=False)
        ds = spifs.open_reader(cfg.output_path)
        times = np.asarray(ds.variables["Time"][:])
        assert len(times) == 3  # 2 original + 1 new (overlap suppressed)
        assert np.all(np.diff(times) > 0)
        ds.close()


class TestFusedVsGeneric:
    """VERDICT r3 #4: the fused CoupledStepFn feature branches
    (qt_variance, cplsurf) vs the generic non-fused driver path — same
    native models, same config; the spifs.nc records must agree,
    including the branch-specific diagnostics (nudge alpha/beta/std,
    surface-coupling pack/unpack)."""

    def _run(self, tmp_path, name, fused, **kw):
        base = dict(gcm_type="sptpu", les_type="sptpu",
                    gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                    les_itot=16, les_jtot=16, les_ktot=24,
                    les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                    les_dt=5.0, timing_phases=0)
        base.update(kw)
        cfg = SPConfig(output_dir=str(tmp_path / name), **base)
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        assert r.coupled is not None
        if not fused:
            r.coupled = None       # force the generic path
        r.run(3)
        r.finalize(save_restart=False)
        ds = spifs.open_reader(cfg.output_path)
        g = ds.groups[str(r.sp_cols[0])]
        out = {k: np.asarray(g.variables[k][...]) for k in g.variables}
        ds.close()
        return out

    def _compare(self, fus, gen, extra_vars):
        for var in ("thl", "qt", "f_T", "f_SH", "f_u", "f_thl",
                    "A_d") + extra_vars:
            a, b = fus[var], gen[var]
            assert a.shape == b.shape, var
            assert np.all(np.isfinite(a)), var
            # both paths integrate the same physics through different
            # program partitions (one fused XLA program vs host-chained
            # jits); f32 fusion differences grow through the LES substeps,
            # so the gate is "same field, same magnitude", not bitwise
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
            assert np.abs(a - b).max() <= 5e-3 * scale + 1e-9, (
                var, np.abs(a - b).max(), scale)

    def test_fused_vs_generic_qt_variance(self, tmp_path):
        kw = dict(qt_forcing="variance")
        fus = self._run(tmp_path, "fused", True, **kw)
        gen = self._run(tmp_path, "generic", False, **kw)
        self._compare(fus, gen, ("qt_alpha", "qt_beta", "qt_std"))
        # the nudge actually engaged: beta written on post-first steps
        assert np.any(fus["qt_beta"][1:] != 0.0)

    @pytest.mark.slow   # second fused-vs-generic leg; qt_variance stays fast
    def test_fused_vs_generic_cplsurf(self, tmp_path):
        kw = dict(cplsurf=True)
        fus = self._run(tmp_path, "fused", True, **kw)
        gen = self._run(tmp_path, "generic", False, **kw)
        self._compare(fus, gen, ("z0m", "z0h", "wthl", "wqt",
                                 "SHflux", "TSflux", "QLflux"))
        # surface fluxes reached the LES (non-trivial values)
        assert np.any(fus["wthl"] != 0.0) or np.any(fus["wqt"] != 0.0)


class TestPhasedVsFused:
    """VERDICT r4 weak #3: every timing_phases-th production step runs
    through call_phased (pre/evolve/post programs with host barriers,
    coupler.py:100-129) instead of the fused program; the trajectories
    must agree — same physics, different program partition."""

    def _run(self, tmp_path, name, timing_phases):
        cfg = SPConfig(output_dir=str(tmp_path / name),
                       gcm_type="sptpu", les_type="sptpu",
                       gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                       les_itot=16, les_jtot=16, les_ktot=24,
                       les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                       les_dt=5.0, timing_phases=timing_phases)
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        assert r.coupled is not None
        r.run(4)          # with timing_phases=2, step index 2 is phased
        r.finalize(save_restart=False)
        ds = spifs.open_reader(cfg.output_path)
        g = ds.groups[str(r.sp_cols[0])]
        out = {k: np.asarray(g.variables[k][...]) for k in g.variables}
        ds.close()
        timing = (tmp_path / name / "timing.txt").read_text()
        return out, timing

    def test_phased_matches_fused_trajectory(self, tmp_path):
        fus, _ = self._run(tmp_path, "fused", 0)
        pha, timing = self._run(tmp_path, "phased", 2)
        for var in ("thl", "qt", "u", "v", "f_T", "f_SH", "f_u",
                    "f_thl", "A_d"):
            a, b = fus[var], pha[var]
            assert a.shape == b.shape, var
            assert np.all(np.isfinite(b)), var
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
            assert np.abs(a - b).max() <= 5e-3 * scale + 1e-9, (
                var, np.abs(a - b).max(), scale)
        # the phased step actually recorded per-phase columns: the row
        # for step index 2 carries nonzero gcm_half1/gcm_half2 wall times
        rows = [ln.split() for ln in timing.splitlines()
                if ln and not ln.startswith("#")]
        rows = [r for r in rows if len(r) >= 7]
        phased_rows = [i for i, r in enumerate(rows)
                       if float(r[1]) > 0.0 or float(r[5]) > 0.0]
        assert phased_rows == [2], timing


class TestChunkedEvolve:
    @pytest.mark.slow   # chunked-evolve trajectory equality (2 full
    # driver runs); the shard_map evolve leg stays fast
    def test_chunked_matches_monolithic(self, tmp_path):
        """les_evolve_chunks=3 gives the same trajectory as one program
        (the chunks split the evolve interval exactly)."""
        import jax
        base = dict(gcm_type="sptpu", les_type="sptpu",
                    gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                    les_itot=16, les_jtot=16, les_ktot=24,
                    les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                    les_dt=5.0)
        cfg1 = SPConfig(output_dir=str(tmp_path / "a"), **base)
        cfg2 = SPConfig(output_dir=str(tmp_path / "b"),
                        les_evolve_chunks=3, **base)
        outs = []
        for cfg in (cfg1, cfg2):
            r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
            r.initialize()
            assert r.coupled is not None
            r.run(2)
            prof = jax.tree.map(np.asarray, r.fleet.get_profiles())
            outs.append((prof, r.gcm.get_model_time()))
            r.finalize(save_restart=False)
        (p1, t1), (p2, t2) = outs
        assert t1 == t2
        # dt=5 divides 600/3=200 exactly: identical substep sequence
        np.testing.assert_allclose(p2["THL"], p1["THL"], rtol=2e-6,
                                   atol=2e-4)
        np.testing.assert_allclose(p2["QT"], p1["QT"], rtol=2e-5,
                                   atol=1e-8)

    @pytest.mark.slow   # shard_map evolve leg; covered fast by
    # test_parallel.py + the efficiency harness
    def test_les_axis_shard_map_evolve(self, tmp_path):
        """Pure instance-parallel mesh (les=8): the fused coupled step
        runs the adaptive evolve under shard_map (per-device while_loop,
        no straggler coupling across devices) and matches shapes."""
        cfg = SPConfig(gcm_type="sptpu", les_type="sptpu",
                       gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                       les_itot=16, les_jtot=16, les_ktot=24,
                       les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                       les_dt=5.0, output_dir=str(tmp_path / "out"),
                       mesh_les=8, max_num_les=8)
        geoms = [geometry.Point((20.0 + 40 * i, 10.0)) for i in range(8)]
        r = SPRunner(cfg, geoms)
        r.initialize()
        assert r.mesh is not None and dict(r.mesh.shape)["les"] == 8
        assert len(r.sp_cols) == 8
        r.run(2)
        r.finalize(save_restart=False)
        ds = spifs.open_reader(cfg.output_path)
        for col in r.sp_cols:
            thl = np.asarray(ds.groups[str(col)].variables["thl"][:])
            assert thl.shape == (2, 24) and np.all(np.isfinite(thl))
        ds.close()


class TestCrossOutput:
    @pytest.mark.slow   # cross.nc e2e leg (heavy driver run)
    def test_fused_run_writes_cross_sections(self, tmp_path):
        """les_cross=True (NAMCROSSSECTION lcross) -> per-instance
        les-work-<col>/cross.nc via the native async writer, at the dtav
        cadence capped by the coupled step (README.md:108-111)."""
        from sp_coupler_tpu.io import spnc
        cfg = SPConfig(gcm_type="sptpu", les_type="sptpu",
                       gcm_truncation=10, gcm_levels=8, gcm_dt=600.0,
                       les_itot=16, les_jtot=16, les_ktot=24,
                       les_xsize=3200.0, les_ysize=3200.0, les_dz=100.0,
                       les_dt=5.0, max_num_les=1, les_cross=True,
                       les_cross_heights=(2, 10), les_cross_dtav=60.0,
                       output_dir=str(tmp_path / "out"))
        r = SPRunner(cfg, [geometry.Point((300.0, 15.0))])
        r.initialize()
        r.run(2)
        r.finalize(save_restart=False)
        col = r.sp_cols[0]
        path = tmp_path / "out" / ("les-work-%d" % col) / "cross.nc"
        assert path.exists()
        data, units = spnc.read_cdf(str(path))
        assert data["thlxy001"].shape[1:] == (16, 16)  # 0-based level 1
        assert data["thlxy001"].shape[0] >= 2          # one per step
        assert np.all(np.isfinite(data["lwp"]))
        assert units["lwp"] == "kg/m^2"


class TestFailureDetection:
    def test_check_finite_profiles_raises_and_names_column(self, tmp_path):
        cfg = SPConfig(output_dir=str(tmp_path / "out"), check_finite=True)
        r = SPRunner(cfg)
        r.sp_cols = [3, 17]
        prof = {"THL": np.array([[300.0, 301.0], [300.0, np.nan]])}
        with pytest.raises(FloatingPointError) as ei:
            r._check_finite_profiles(prof)
        assert "17" in str(ei.value)

    def test_check_finite_disabled(self, tmp_path):
        cfg = SPConfig(output_dir=str(tmp_path / "out"), check_finite=False)
        r = SPRunner(cfg)
        r.sp_cols = [3]
        r._check_finite_profiles({"THL": np.array([[np.nan]])})  # no raise


class TestWriteEvery:
    def test_write_every_two(self, tmp_path):
        """write_every=2: spifs.nc records every other coupled step."""
        cfg = SPConfig(gcm_type="dummy", les_type="dummy",
                       output_dir=str(tmp_path / "out"), write_every=2)
        geoms = [geometry.Point((45.0, 10.0))]
        r = SPRunner(cfg, geoms)
        r.initialize()
        r.run(4)
        r.finalize(save_restart=False)
        ds = spifs.open_reader(cfg.output_path)
        times = np.asarray(ds.variables["Time"][:])
        # initialize() writes the first record and step 0 (firststep)
        # shares it; step 2 adds one; steps 1/3 skip -> 2 records
        assert len(times) == 2
        ds.close()
