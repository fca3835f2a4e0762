"""Geohash encoding as a pure SQL/Column expression (no UDF).

The reference's "IncidentMap" tile map runs an Elasticsearch ``geohash_grid``
aggregation (``kibana-exported-visualizations.json`` viz 7, precision 2) over a
``geo_point`` field. Spark has no geohash built-in, so we synthesize one — but
as a *native column expression* (bit arithmetic + base32 table lookup), not a
Python UDF: it stays inside whole-stage codegen and costs nothing extra at
100 TB scale.

Algorithm (public geohash spec): a geohash of precision ``p`` encodes
``5*p`` bits, alternating longitude/latitude starting with longitude at the
MSB. The iterative bisection is equivalent to fixed-point quantization:

    x = floor((lon + 180) / 360 * 2^nx)   with nx = ceil(5p/2)  lon bits
    y = floor((lat +  90) / 180 * 2^ny)   with ny = floor(5p/2) lat bits

then interleave the bits of x and y (x first) and emit base32 digits from the
alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.

Because the whole computation is integer arithmetic on two quantized values,
the *same* SQL text runs on any ANSI engine — ``geohash_encode_sql`` emits it
for the DuckDB oracle, and ``geohash_encode`` wraps it as a Spark Column.
Verified against published test vectors (see tests/test_geohash.py), e.g.
ezs42 = (42.605, -5.603).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Kibana's tile map ships autoPrecision:true (the reference viz does too —
# kibana-exported-visualizations.json viz 7): the map's zoom level picks the
# geohash precision. This is Kibana 4.x's zoomPrecision table
# (src/ui/public/vislib/visualizations/_map.js, public kibana source).
ZOOM_PRECISION = {
    1: 2, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4, 8: 5, 9: 5, 10: 6,
    11: 6, 12: 7, 13: 7, 14: 8, 15: 9, 16: 10, 17: 11, 18: 12,
}


def auto_precision(zoom: int) -> int:
    """Kibana autoPrecision: map zoom level -> geohash_grid precision
    (clamped to the table's 1..18 zoom range)."""
    return ZOOM_PRECISION[min(max(int(zoom), 1), 18)]


def _quantize_sql(lat: str, lon: str, precision: int) -> tuple[str, str, int, int]:
    bits = 5 * precision
    nx = (bits + 1) // 2  # lon bits (lon gets the extra bit)
    ny = bits // 2  # lat bits
    # Clamp BOTH sides (like geotile_sql) so lat=90/lon=180 stay in the top
    # cell and out-of-range coordinates pin to an edge cell instead of
    # sign-extending negative shift bits into legitimate-looking buckets.
    x = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * {1 << nx}) "
        f"AS BIGINT), 0), {(1 << nx) - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * {1 << ny}) "
        f"AS BIGINT), 0), {(1 << ny) - 1})"
    )
    return x, y, nx, ny


def geohash_encode_sql(lat: str, lon: str, precision: int = 2) -> str:
    """Emit engine-portable ANSI SQL computing the geohash of (lat, lon).

    ``lat``/``lon`` are SQL expressions. The result is a string of
    ``precision`` base32 characters. Runs identically on Spark SQL and DuckDB
    (used verbatim as the oracle for the geohash_grid aggregation).
    """
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    x_sql, y_sql, nx, ny = _quantize_sql(lat, lon, precision)
    bits = 5 * precision

    # bit position b (0 = MSB of the geohash): even -> lon bit, odd -> lat bit.
    # Bit b of the hash = bit (nx-1 - b//2) of x   when b even,
    #                     bit (ny-1 - b//2) of y   when b odd.
    # Collision-proof placeholders (NOT '(x)'/'(y)': an input expression
    # containing those substrings would be rewritten by the substitution).
    if "__GH_X__" in lat + lon or "__GH_Y__" in lat + lon:
        raise ValueError("lat/lon expressions may not contain __GH_X__/__GH_Y__")

    def bit_expr(b: int) -> str:
        if b % 2 == 0:
            src, shift = "__GH_X__", nx - 1 - b // 2
        else:
            src, shift = "__GH_Y__", ny - 1 - b // 2
        return f"(({src} >> {shift}) & 1)"

    chars = []
    for c in range(precision):
        terms = []
        for j in range(5):
            b = 5 * c + j
            weight = 1 << (4 - j)
            terms.append(f"{bit_expr(b)} * {weight}")
        idx = " + ".join(terms)
        chars.append(f"SUBSTR('{BASE32}', CAST({idx} AS INT) + 1, 1)")
    body = " || ".join(chars) if len(chars) > 1 else chars[0]
    # Inline x/y via a correlated scalar — portable across Spark/DuckDB — is
    # clunky; instead substitute the quantization expressions textually.
    body = body.replace("__GH_X__", f"({x_sql})").replace("__GH_Y__", f"({y_sql})")
    return f"({body})"


def geohash_encode(lat: Column | str, lon: Column | str, precision: int = 2) -> Column:
    """Geohash of two numeric columns as a Spark Column (codegen-friendly).

    str inputs are SQL expressions (routed through geohash_encode_sql);
    Column inputs are built natively from Column arithmetic — no private
    ``_jc`` access, so this works under Spark Connect too."""
    if isinstance(lat, str) and isinstance(lon, str):
        return F.expr(geohash_encode_sql(lat, lon, precision))
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    return _geohash_encode_cols(lat_c, lon_c, precision)


def _geohash_encode_cols(lat: Column, lon: Column, precision: int) -> Column:
    """Column-native mirror of geohash_encode_sql (same quantization, same
    bit interleave, same base32 lookup — pinned equal by tests)."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    bits = 5 * precision
    nx = (bits + 1) // 2
    ny = bits // 2
    x = F.least(
        F.greatest(
            F.floor(
                (lon + F.lit(180.0)) / 360.0 * F.lit(float(1 << nx))
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit((1 << nx) - 1).cast("bigint"),
    )
    y = F.least(
        F.greatest(
            F.floor(
                (lat + F.lit(90.0)) / 180.0 * F.lit(float(1 << ny))
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit((1 << ny) - 1).cast("bigint"),
    )
    chars = []
    for c in range(precision):
        idx: Column = F.lit(0)
        for j in range(5):
            b = 5 * c + j
            if b % 2 == 0:
                src, shift = x, nx - 1 - b // 2
            else:
                src, shift = y, ny - 1 - b // 2
            bit = F.shiftright(src, shift).bitwiseAND(F.lit(1))
            idx = idx + bit * F.lit(1 << (4 - j))
        chars.append(F.substring(F.lit(BASE32), idx.cast("int") + F.lit(1), F.lit(1)))
    return F.concat(*chars) if len(chars) > 1 else chars[0]


# -- geotile (slippy-map z/x/y) ----------------------------------------------

# Web-Mercator latitude limit: tiles are undefined beyond ±85.05112878°
# (ES geotile_grid clamps the same way).
_MERCATOR_LAT = 85.05112878


def geotile_sql(lat: str, lon: str, zoom: int = 7) -> str:
    """ES ``geotile_grid`` key ``'z/x/y'`` as a portable SQL expression.

    Standard slippy-map tiling (OSM spec, same math ES uses):

        n = 2^z
        x = floor((lon + 180) / 360 * n)
        y = floor((1 - ln(tan(φ) + 1/cos(φ)) / π) / 2 * n)   φ = lat·π/180

    Latitude is clamped to ±85.05112878 (Web-Mercator domain) and x/y to
    [0, n-1] so poles and the antimeridian stay in the edge tiles. Every
    function used (LN/TAN/COS/RADIANS/PI/FLOOR/LEAST/GREATEST) is identical
    ANSI SQL on Spark and DuckDB, so the same text is its own oracle.
    Like geohash_encode_sql this is pure column arithmetic — whole-stage
    codegen, no UDF, free at scale.
    """
    if not 0 <= zoom <= 29:
        raise ValueError("geotile zoom must be in 0..29")
    n = 1 << zoom
    phi = (
        f"RADIANS(LEAST(GREATEST(CAST(({lat}) AS DOUBLE), {-_MERCATOR_LAT}), "
        f"{_MERCATOR_LAT}))"
    )
    x = (
        f"LEAST(GREATEST(CAST(FLOOR(((({lon}) + 180.0) / 360.0) * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR((1.0 - LN(TAN({phi}) + 1.0 / COS({phi})) "
        f"/ PI()) / 2.0 * {n}) AS BIGINT), 0), {n - 1})"
    )
    return f"('{zoom}/' || CAST({x} AS STRING) || '/' || CAST({y} AS STRING))"


def geotile_encode(lat: str, lon: str, zoom: int = 7) -> Column:
    """Spark Column form of :func:`geotile_sql` (expressions given as SQL
    strings, same contract as geohash_encode's str path)."""
    return F.expr(geotile_sql(lat, lon, zoom))


def hex_qr_sql(lat: str, lon: str, size_deg: float) -> tuple[str, str]:
    """Axial hex-cell coordinates (q, r) for a pointy-top hexagonal grid
    of circumradius ``size_deg`` degrees in equirectangular lat/lon space
    — the engine's ``geohex_grid`` analog.

    ES's geohex_grid uses Uber H3, whose icosahedral gnomonic projection
    needs the h3 library (absent in this container); this grid keeps the
    property the agg actually exploits — a hexagonal tiling with
    6-neighbor adjacency and ~equal-size cells locally — while being pure
    column arithmetic. The deviation (degree-space cells shrink in ground
    area toward the poles, like geohash cells do) is documented here, not
    hidden.

    Math (standard axial pixel→hex with cube rounding, Amit Patel's
    formulation): fractional ``qf = (√3/3·x − 1/3·y)/s``,
    ``rf = (2/3·y)/s``, cube-round with the largest-residual fix so
    q+y+r stays 0. Rounding is pinned to FLOOR(v + 0.5) — identical
    half-up in both engines (Spark's FLOOR returns BIGINT, DuckDB's
    DOUBLE, hence the explicit casts). Every operand is ANSI-portable,
    so the same text is its own oracle.
    """
    if size_deg <= 0:
        raise ValueError("size_deg must be positive")
    s = float(size_deg)
    x, y = f"CAST(({lon}) AS DOUBLE)", f"CAST(({lat}) AS DOUBLE)"
    qf = f"((0.5773502691896258 * {x} - 0.3333333333333333 * {y}) / {s})"
    rf = f"((0.6666666666666666 * {y}) / {s})"
    yf = f"(-({qf}) - ({rf}))"
    rq = f"CAST(FLOOR({qf} + 0.5) AS BIGINT)"
    ry = f"CAST(FLOOR({yf} + 0.5) AS BIGINT)"
    rr = f"CAST(FLOOR({rf} + 0.5) AS BIGINT)"
    dq = f"ABS({rq} - ({qf}))"
    dy = f"ABS({ry} - ({yf}))"
    dr = f"ABS({rr} - ({rf}))"
    fix_q = f"({dq} > {dy} AND {dq} > {dr})"
    q_final = f"(CASE WHEN {fix_q} THEN -({ry}) - ({rr}) ELSE {rq} END)"
    r_final = (
        f"(CASE WHEN {fix_q} THEN {rr} "
        f"WHEN {dy} > {dr} THEN {rr} "
        f"ELSE -({rq}) - ({ry}) END)"
    )
    return q_final, r_final


def hex_key_sql(lat: str, lon: str, size_deg: float) -> str:
    """``'q:r'`` text key for :func:`hex_qr_sql` (the bucket key the
    hex_grid agg groups by). ``||`` instead of concat(): Spark's concat
    propagates NULL but DuckDB's SKIPS NULL arguments (inventing a
    phantom ':' bucket for missing coordinates) — the ``||`` operator
    propagates NULL identically in both engines."""
    q, r = hex_qr_sql(lat, lon, size_deg)
    return (
        f"(CAST({q} AS STRING) || ':' || CAST({r} AS STRING))"
    )


def hex_center_sql(size_deg: float) -> tuple[str, str]:
    """Cell center (lon, lat) in degrees from axial columns named ``q``
    and ``r`` (inverse of hex_qr_sql's forward transform)."""
    s = float(size_deg)
    # CAST-pin the size literal: Spark parses '5.0' as DECIMAL(2,1) and
    # propagates DECIMAL through the arithmetic (a wire-type trap for the
    # oracle gate); an explicit DOUBLE cast keeps both engines in doubles
    sd = f"CAST({s} AS DOUBLE)"
    lon = f"ROUND({sd} * (1.7320508075688772 * q + 0.8660254037844386 * r), 6)"
    lat = f"ROUND({sd} * 1.5 * r, 6)"
    return lon, lat
