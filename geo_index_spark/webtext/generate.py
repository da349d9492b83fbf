"""Deterministic synthetic web_pages table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
  (url: string, warc_ts: timestamp, html: binary, text: string,
   lang: string)

Geotag distribution exercises real skew: 80% of pages cluster around 50
"city" centers (Gaussian sigma = 0.1 deg), 20% uniform — dense city
tiles are exactly what the salted/AQE join path must absorb.

Generation is vectorized numpy + pandas (seeded, reproducible at any
scale); ``text`` is produced by the reference extractor so the
byte-identity invariant holds by construction and the Spark extraction
is tested against it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_index_spark.webtext.extract import extract_text

LANGS = ("en", "de", "fr", "es", "ja")

_TEMPLATE = (
    "<html><head><title>Page {i}</title>"
    '<meta name="geo.position" content="{lat};{lon}">'
    "<style>body {{color: #333}}</style>"
    "<script>var x = {i}; // tracking</script>"
    "</head><body><!-- boilerplate header -->"
    "<h1>Site {site} &amp; friends</h1>"
    "<p>Document {i} discusses coordinates near ({lat}; {lon}).</p>"
    "<p>Filler paragraph {i} with &lt;markup&gt; and &quot;quotes&quot;.</p>"
    "</body></html>"
)


def gen_points(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) arrays: 80% clustered on 50 city centers, 20% uniform."""
    rng = np.random.default_rng(seed)
    cities_lon = rng.uniform(-180, 180, 50)
    cities_lat = rng.uniform(-60, 70, 50)
    n_clustered = int(n * 0.8)
    # zipf-ish city popularity -> real skew (a few mega-cities)
    weights = 1.0 / np.arange(1, 51) ** 1.2
    weights /= weights.sum()
    idx = rng.choice(50, size=n_clustered, p=weights)
    lon_c = cities_lon[idx] + rng.normal(0, 0.1, n_clustered)
    lat_c = cities_lat[idx] + rng.normal(0, 0.1, n_clustered)
    lon_u = rng.uniform(-180, 180, n - n_clustered)
    lat_u = rng.uniform(-85, 85, n - n_clustered)
    lon = np.clip(np.concatenate([lon_c, lon_u]), -180, 179.999999)
    lat = np.clip(np.concatenate([lat_c, lat_u]), -85, 85)
    return np.round(lon, 6), np.round(lat, 6)


def web_pages_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    lon, lat = gen_points(n, seed)
    i = np.arange(n)
    urls = [f"https://site{k % 1000}.example/{k}" for k in i]
    html = [
        _TEMPLATE.format(i=int(k), site=int(k) % 1000, lat=lat[k], lon=lon[k]).encode("utf-8")
        for k in i
    ]
    text = [extract_text(h) for h in html]
    ts = pd.Timestamp("2025-01-01T00:00:00Z").tz_localize(None) + pd.to_timedelta(i, unit="s")
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": [LANGS[int(k) % len(LANGS)] for k in i],
        }
    )


def web_pages_df(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    df = spark.createDataFrame(web_pages_pdf(n, seed))
    return df.repartition(num_partitions) if num_partitions else df
