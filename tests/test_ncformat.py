"""spifs.nc must be valid netCDF-4-flavored HDF5 for third-party tools.

No netCDF4/xarray/h5netcdf package exists in this image, so conformance is
checked at the raw HDF5 level against the conventions those readers key on
(netCDF-4 format spec): dimension-scale datasets with CLASS=DIMENSION_SCALE,
variables attached via DIMENSION_LIST, an unlimited (maxshape None) record
dimension, units attributes, and the _NCProperties provenance marker.
Reference consumer story: /root/reference/examples/access-spifs-nc.py.
"""

import datetime

import h5py
import numpy as np

from sp_coupler_tpu.io import spifs


def _write_sample(path):
    w = spifs.SpifsWriter(
        str(path), gcm_ktot=8,
        les_info={"x": np.arange(4) * 100.0 + 50.0,
                  "y": np.arange(4) * 100.0 + 50.0,
                  "zf": np.arange(6) * 25.0 + 12.5},
        start_time=datetime.datetime(2000, 1, 1))
    w.add_les_column(7, 13.0, -59.0)
    w.add_output_column(9, 14.0, -58.0)
    for s in range(3):
        w.update_time(900.0 * (s + 1))
        w.write_column(7, thl=np.full(6, 300.0), U=np.full(8, 5.0),
                       rain=0.5 * s)
        w.write_column(9, U=np.full(8, 4.0))
    w.sync()
    w.close()


def test_netcdf4_hdf5_conventions(tmp_path):
    path = tmp_path / "spifs.nc"
    _write_sample(path)

    f = h5py.File(str(path), "r")
    # provenance marker
    assert "_NCProperties" in f.attrs

    # dimension scales at root
    for dim in ("Time", "x", "y", "zf", "oifs_height"):
        d = f[dim]
        assert d.attrs.get("CLASS", b"") == b"DIMENSION_SCALE", dim

    # Time: unlimited record coordinate with units
    t = f["Time"]
    assert t.maxshape == (None,)
    assert t.shape == (3,)
    units = t.attrs["units"]
    units = units.decode() if isinstance(units, bytes) else units
    assert units.startswith("s since 2000-01-01")

    # phony (non-variable) dimension keeps the netCDF marker text
    name = f["oifs_height"].attrs["NAME"]
    name = name.decode() if isinstance(name, bytes) else name
    assert name.startswith("This is a netCDF dimension but not a")

    # group variables carry DIMENSION_LIST referencing the root scales
    g = f["7"]
    thl = g["thl"]
    assert "DIMENSION_LIST" in thl.attrs
    refs = thl.attrs["DIMENSION_LIST"]
    scales = [f[refs[ax][0]].name for ax in range(2)]
    assert scales == ["/Time", "/zf"]
    assert thl.shape == (3, 6) and thl.dtype == np.float32

    U = g["U"]
    refs = U.attrs["DIMENSION_LIST"]
    assert f[refs[1][0]].name == "/oifs_height"

    # scalar-per-step variable rides the record dimension alone
    rain = g["rain"]
    assert rain.shape == (3,) and rain.maxshape == (None,)
    np.testing.assert_allclose(rain[:], [0.0, 0.5, 1.0])
    f.close()


def test_append_preserves_conventions(tmp_path):
    path = tmp_path / "spifs.nc"
    _write_sample(path)
    w = spifs.SpifsWriter(str(path), gcm_ktot=8, append=True)
    w.update_time(3600.0)
    w.write_column(7, thl=np.full(6, 301.0))
    w.close()

    f = h5py.File(str(path), "r")
    assert f["Time"].shape == (4,)
    assert f["Time"].attrs.get("CLASS", b"") == b"DIMENSION_SCALE"
    assert f["7"]["thl"].shape == (4, 6)
    assert float(f["7"]["thl"][3, 0]) == 301.0
    f.close()
