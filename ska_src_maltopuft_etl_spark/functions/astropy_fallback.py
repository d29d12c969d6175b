"""Astropy-backed parity kernels (SURVEY.md §7.1 step 2).

The production kernels in ``functions/kernels.py`` are native Column
expressions; these vectorized pandas_udf wrappers around astropy exist
ONLY to cross-validate them where astropy is available (it is not in
this container — everything here is import-gated with a clear error).

Reference call sites being validated:

- utils/coordinate.py:7-19 (SkyCoord hourangle/deg → degrees, 5 dp)
- meertrap/candidate/transform.py:71-84 (Time(mjd).isot → datetime)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, TimestampType


def _require_astropy():
    try:
        import astropy  # noqa: F401
    except ImportError as exc:  # pragma: no cover - astropy not installed
        raise ImportError(
            "astropy is not installed; the native kernels in "
            "functions/kernels.py are the production path — these "
            "fallbacks exist only for cross-validation where astropy "
            "is available"
        ) from exc


def hms_to_degrees_astropy(ra: Column | str, dec: Column | str) -> tuple[Column, Column]:
    """(ra_deg, dec_deg) via astropy SkyCoord, vectorized per Arrow batch."""
    _require_astropy()

    @F.pandas_udf(DoubleType())
    def _ra(ra_s: pd.Series, dec_s: pd.Series) -> pd.Series:
        from astropy import units as u
        from astropy.coordinates import SkyCoord

        coords = SkyCoord(ra=ra_s.tolist(), dec=dec_s.tolist(), unit=(u.hourangle, u.deg))
        return pd.Series(coords.ra.deg).round(5)

    @F.pandas_udf(DoubleType())
    def _dec(ra_s: pd.Series, dec_s: pd.Series) -> pd.Series:
        from astropy import units as u
        from astropy.coordinates import SkyCoord

        coords = SkyCoord(ra=ra_s.tolist(), dec=dec_s.tolist(), unit=(u.hourangle, u.deg))
        return pd.Series(coords.dec.deg).round(5)

    ra_c = F.col(ra) if isinstance(ra, str) else ra
    dec_c = F.col(dec) if isinstance(dec, str) else dec
    return _ra(ra_c, dec_c), _dec(ra_c, dec_c)


def mjd_to_timestamp_astropy(mjd: Column | str) -> Column:
    """MJD → UTC timestamp via astropy Time, vectorized per Arrow batch."""
    _require_astropy()

    @F.pandas_udf(TimestampType())
    def _conv(mjd_s: pd.Series) -> pd.Series:
        from astropy.time import Time

        t = Time(mjd_s.to_numpy(), format="mjd")
        return pd.Series(pd.to_datetime(t.isot))

    return _conv(F.col(mjd) if isinstance(mjd, str) else mjd)
