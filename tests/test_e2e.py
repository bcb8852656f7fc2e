"""End-to-end factoring runs with pinned sigmas (the reference's test.csh /
test_t35.csh strategy, SURVEY.md section 4): fixed sigma => the known factor
MUST appear at the given stage and bounds."""

import os

import pytest

from tpu_ecm import driver, params
from tpu_ecm.io import calc as _calc
from tpu_ecm.io import savefile

# P35 is prime; curve group orders searched offline with the int oracle:
#   sigma=174: stage-1 hit at B1=300
#   sigma=112: stage-2 hit (first prime 1361 in (300, 10000])
P35 = 34359738421
P36 = 68719476767
N71 = P35 * P36


def _cfg(tmp_path, **kw):
    kw.setdefault("save_b1_path", str(tmp_path / "save_b1.txt"))
    kw.setdefault("checkpoint_path", str(tmp_path / "checkpoint.txt"))
    kw.setdefault("results_path", str(tmp_path / "ecm_results.txt"))
    kw.setdefault("cache_dir", str(tmp_path / "cache"))
    kw.setdefault("verbose", 0)
    return driver.RunConfig(**kw)


def test_stage1_finds_factor(tmp_path):
    cfg = _cfg(tmp_path, n=N71, curves=4, b1=300, b2=300, sigma=172)
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == P35 and h.stage == 1 for h in res.factors), \
        res.factors
    hit = [h for h in res.factors if h.factor == P35][0]
    assert hit.sigma == 174
    # savefile written with all 4 curves, parseable, N is the input
    with open(cfg.save_b1_path) as f:
        recs = list(savefile.parse_records(f))
    assert len(recs) == 4
    assert all(r.n == N71 and r.b1 == 300 for r in recs)
    # results log mentions the factor
    assert str(P35) in open(cfg.results_path).read()


def test_even_input_strips_twos(tmp_path):
    """Even inputs must not crash Montgomery setup: powers of 2 are divided
    out up front, reported as trivial factors, and the odd part still runs
    (and stop_on_factor ignores the trivial hit)."""
    cfg = _cfg(tmp_path, n=8 * N71, curves=4, b1=300, b2=300, sigma=172)
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == 2 and h.stage == 0 for h in res.factors)
    assert any(h.factor == P35 and h.stage == 1 for h in res.factors)
    with pytest.raises(ValueError):
        driver.ECMDriver(_cfg(tmp_path, n=64, curves=1, b1=100))


def test_structure_checks_short_circuit(tmp_path):
    """Perfect powers factor their base; probable-prime inputs (and prime
    bases) run zero curves and are reported as PRP hits (the GMP-ECM-style
    up-front structure checks; the reference would run curves whose every
    gcd hits n itself)."""
    r = driver.ECMDriver(_cfg(tmp_path, n=9, curves=2, b1=100)).run()
    assert any(h.factor == 3 for h in r.factors) and r.curves_run == 0
    r = driver.ECMDriver(_cfg(tmp_path, n=101, curves=2, b1=100)).run()
    assert any(h.factor == 101 and h.is_prp for h in r.factors)
    assert r.curves_run == 0
    r = driver.ECMDriver(_cfg(tmp_path, n=8 * 101, curves=2, b1=100)).run()
    assert {h.factor for h in r.factors} == {2, 101}
    # composite non-power inputs still run normally
    r = driver.ECMDriver(_cfg(tmp_path, n=15, curves=2, b1=100,
                              sigma=20)).run()
    assert r.curves_run > 0


def test_resume_stage2_from_savefile(tmp_path):
    """Stage-2 resume from a stage-1 savefile (the `ecm -resume` workflow
    the reference delegates to GMP-ECM): rebuild curves from the saved
    SIGMA, lift X/Z into Montgomery form, run stage 2 only.  The sigma-112
    oracle factor MUST appear."""
    sv = str(tmp_path / "save_b1.txt")
    driver.ECMDriver(_cfg(tmp_path, n=N71, curves=4, b1=300, b2=300,
                          sigma=110, save_b1_path=sv)).run()
    res = driver.resume_stage2(sv, 10000, verbose=0,
                               results_path=str(tmp_path / "r2.txt"),
                               cache_dir=str(tmp_path / "cache"))
    assert any(h.factor == P35 and h.stage == 2 and h.sigma == 112
               for h in res.factors), res.factors
    # guard rails
    with pytest.raises(ValueError):
        driver.resume_stage2(sv, 300)   # B2 <= savefile B1


@pytest.mark.slow
def test_resume_stage2_batched_and_sharded(tmp_path):
    """A 10k-record savefile is resumed in device-sized batch groups (and
    sharded over the 8-device CPU mesh): the (factor, sigma) find-set must
    be identical to the single-group resume — stage-2 hits, stage-1
    leftover-Z hits, and inversion-failure harvests are all grouping- and
    sharding-independent (the golden-sweep invariant applied to resume)."""
    from tpu_ecm.parallel.mesh import Sharder
    sv = str(tmp_path / "save_b1.txt")
    n_curves = 10_016
    driver.ECMDriver(_cfg(tmp_path, n=N71, curves=n_curves, b1=300, b2=300,
                          sigma=110, save_b1_path=sv,
                          checkpoint_path=None, stop_on_factor=False,
                          results_path=str(tmp_path / "r0.txt"))).run()

    def finds(**kw):
        res = driver.resume_stage2(
            sv, 2000, verbose=0, cache_dir=str(tmp_path / "cache"),
            results_path=str(tmp_path / "r.txt"), **kw)
        assert res.curves_run == n_curves
        return {(h.factor, h.sigma, h.stage) for h in res.factors}

    whole = finds()                      # one group of all 10,016 records
    assert any(f == P35 for f, _, _ in whole)   # oracle sigma-112-style hits
    assert finds(batch=4096) == whole           # 3 uneven groups
    assert finds(batch=2048, sharder=Sharder()) == whole   # 8-device mesh


def test_calc_huge_sqrt():
    big = (10 ** 400 + 7) ** 2
    assert _calc.calc(f"sqrt({big})") == 10 ** 400 + 7


def test_stage2_finds_factor(tmp_path):
    cfg = _cfg(tmp_path, n=N71, curves=4, b1=300, b2=10000, sigma=110)
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == P35 and h.stage == 2 for h in res.factors), \
        res.factors
    hit = [h for h in res.factors if h.factor == P35][0]
    assert hit.sigma == 112


def _prp550(seed):
    import random
    rng = random.Random(seed)
    while True:
        c = rng.getrandbits(550) | 1 | (1 << 549)
        if all(pow(a, c - 1, c) == 1 for a in (2, 3, 5, 7, 11)):
            return c


def test_engine_probe_cache_and_fallback(tmp_path, monkeypatch):
    """The digit/RNS crossover auto-probe (VERDICT r2 item 8): inside
    [RNS_PROBE_LO, RNS_PROBE_HI) on a Pallas backend the driver consults
    the per-(backend, w, nw) result persisted in engine_probe.json; a
    seeded file short-circuits the timing run entirely, and a probe
    failure falls back to the static RNS_MIN_BITS threshold."""
    import json

    n = _prp550(3) * _prp550(7)         # ~1100 bits: inside the probe band
    assert driver.RNS_PROBE_LO <= n.bit_length() < driver.RNS_PROBE_HI
    ctx = params.make_monty(n)
    key = f"cpu_w{ctx.p.w}_nw{ctx.p.nw}_{driver._kernel_fingerprint()}"

    for want in ("rns", "digit"):
        cache = tmp_path / f"cache_{want}"
        cache.mkdir()
        (cache / "engine_probe.json").write_text(json.dumps({key: want}))
        cfg = _cfg(tmp_path, n=n, curves=1, b1=100, engine="auto",
                   use_pallas=True, pallas_interpret=True,
                   cache_dir=str(cache))
        assert driver.ECMDriver(cfg).engine == want

    # probe failure -> static threshold (1100 < RNS_MIN_BITS=1400 -> digit)
    def boom(*a, **k):
        raise RuntimeError("probe exploded")

    monkeypatch.setattr(driver, "_measured_engine", boom)
    cache2 = tmp_path / "cache_none"
    cache2.mkdir()
    cfg = _cfg(tmp_path, n=n, curves=1, b1=100, engine="auto",
               use_pallas=True, pallas_interpret=True,
               cache_dir=str(cache2))
    assert driver.ECMDriver(cfg).engine == "digit"


def test_engine_probe_store_prunes_only_superseded(tmp_path):
    """engine_probe.json writes must replace only the same-geometry entry
    with an older kernel fingerprint; other geometries and other checkouts'
    fingerprints survive (ADVICE r3: shared cache_dir across revisions)."""
    import json

    path = tmp_path / "engine_probe.json"
    path.write_text(json.dumps({
        "cpu_w12_nw36_oldfp0000000": "digit",    # superseded: same geometry
        "cpu_w12_nw360_otherfp0000": "rns",      # different geometry (nw360)
        "axon_w12_nw36_oldfp000000": "digit",    # different backend
        "cpu_w11_nw40_fpAAAAAAAAAA": "rns",      # different geometry
    }))
    driver._probe_store(str(path), "cpu_w12_nw36_newfp1111111", "rns")
    data = json.loads(path.read_text())
    assert data == {
        "cpu_w12_nw36_newfp1111111": "rns",
        "cpu_w12_nw360_otherfp0000": "rns",
        "axon_w12_nw36_oldfp000000": "digit",
        "cpu_w11_nw40_fpAAAAAAAAAA": "rns",
    }
    # idempotent re-store of the same key
    driver._probe_store(str(path), "cpu_w12_nw36_newfp1111111", "digit")
    assert json.loads(path.read_text())["cpu_w12_nw36_newfp1111111"] == "digit"


def test_stage2_noinv_finds_factor(tmp_path, monkeypatch):
    """TPU_ECM_CROSS=noinv (the reference's inversion-free CROSS_PRODUCT
    build, /root/reference/ecm.c:2526-2530) through the full driver: the
    pinned stage-2 hit must still surface from the final-accumulator gcd,
    and every noinv find must be an inv-mode find (noinv can only LOSE
    inversion-failure harvests — there are no inversions to fail)."""
    cfg = _cfg(tmp_path, n=N71, curves=4, b1=300, b2=10000, sigma=110,
               stop_on_factor=False)
    res_inv = driver.ECMDriver(cfg).run()
    monkeypatch.setenv("TPU_ECM_CROSS", "noinv")
    cfg2 = _cfg(tmp_path / "noinv", n=N71, curves=4, b1=300, b2=10000,
                sigma=110, stop_on_factor=False)
    (tmp_path / "noinv").mkdir()
    res = driver.ECMDriver(cfg2).run()
    assert any(h.factor == P35 and h.stage == 2 and h.sigma == 112
               for h in res.factors), res.factors
    inv_set = {(h.factor, h.stage, h.sigma) for h in res_inv.factors}
    noinv_set = {(h.factor, h.stage, h.sigma) for h in res.factors}
    assert noinv_set <= inv_set


def test_stage1_residues_match_oracle(tmp_path):
    """M127-style smoke (PR1 config): correctness by residue, not luck —
    residues must equal the int-oracle stage-1 exactly."""
    from tpu_ecm.curve import oracle, prac, suyama
    from tpu_ecm.primes import primes_range
    n = N71
    b1 = 200
    cfg = _cfg(tmp_path, n=n, curves=3, b1=b1, b2=b1, sigma=500)
    res = driver.ECMDriver(cfg).run()
    ctx = driver.prepare_context(n, verbose=0)
    dom = oracle.IntDomain(ctx)
    for (sigma, gx, gz) in res.stage1_residues:
        ci = suyama.build_one_curve(ctx, sigma)
        X, Z, s = ci.x_mont, ci.z_mont, ci.s_mont
        for _ in range(prac.stage1_powers_of_two(b1)):
            X, Z = oracle.xdbl_int(dom, X, Z, s)
        for q in primes_range(3, b1).tolist():
            q = int(q)
            k = 1
            while True:
                tape = []
                prac.prac_tape(q, tape)
                X, Z = oracle.run_tape_int(ctx, tape, X, Z, s)[0]
                k *= q
                if k * q >= b1:
                    break
        assert gx == ctx.from_mont_int(X)
        assert gz == ctx.from_mont_int(Z)


def test_mersenne_e2e_residues(tmp_path):
    """Mersenne-path driver run on a 2^e-1 cofactor: arithmetic done mod the
    full Mersenne number (the vnhat trick), factor gcds vs the input."""
    m101 = (1 << 101) - 1
    f1, f2 = 7432339208719, 341117531003194129
    assert f1 * f2 == m101
    cfg = _cfg(tmp_path, n=m101, curves=2, b1=100, b2=100, sigma=900)
    d = driver.ECMDriver(cfg)
    assert d.ctx.is_mersenne and d.ctx.n_int == m101
    res = d.run()
    # residues are canonical mod the Mersenne modulus and nonzero
    for sigma, x, z in res.stage1_residues:
        assert 0 < x < m101 and 0 < z < m101


def test_cli_expression_and_run(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from tpu_ecm.io import cli
    rc = cli.main([str(N71), "2", "300", "0", "300", "174"])
    assert rc == 0
    out = capsys.readouterr().out
    assert str(P35) in out


def test_calc_expressions():
    assert _calc.calc("2^127-1") == (1 << 127) - 1
    assert _calc.calc("fib(791)/13/677/216416017") == \
        _calc._fib(791) // 13 // 677 // 216416017
    assert _calc.calc("10# + 1") == 211
    assert _calc.calc("11#") == 2310
    assert _calc.calc("5!") == 120
    assert _calc.calc("gcd(12, 18)") == 6
    assert _calc.calc("modexp(2, 10, 1000)") == 24
    assert _calc.calc("2^3^2") == 512          # right-assoc
    assert _calc.calc("(2+3)*4") == 20
    assert _calc.calc("1 << 10") == 1024
    assert _calc.calc("sqrt(144)") == 12
    assert _calc.calc("nroot(1000, 3)") == 10
    assert _calc.calc("modinv(3, 7)") == 5
    assert _calc.calc("jacobi(2, 7)") == 1
    assert _calc.calc("luc(10)") == 123
    assert _calc.calc("-5 + 3") == -2


def test_calc_repl_ans_and_user_variables():
    """REPL statement surface: user-variable assignment and the `ans`
    accumulator (/root/reference/calc.c:273-302)."""
    import io
    lines = io.StringIO(
        "2^10\n"
        "ans + 24\n"          # ans carries the previous result
        "x = 3 * 7\n"         # assignment sets the var AND ans
        "x^2 + ans\n"
        "# a comment\n"
        "\n"
        "bogus @\n"           # errors keep state intact
        "x\n"
        "quit\n"
        "99\n")               # after quit: not evaluated
    out = io.StringIO()
    assert _calc.repl(lines, out) == 0
    got = out.getvalue().splitlines()
    assert got[0] == "1024"
    assert got[1] == "1048"
    assert got[2] == "21"
    assert got[3] == str(21 ** 2 + 21)
    assert got[4].startswith("error:")
    assert got[5] == "21"
    assert len(got) == 6


def test_checkpoint_written_between_chunks(tmp_path):
    """Force tiny prime chunks so the mid-stage-1 checkpoint path runs."""
    cfg = _cfg(tmp_path, n=N71, curves=2, b1=900, b2=900, sigma=500,
               prime_chunk=300)
    res = driver.ECMDriver(cfg).run()
    assert os.path.exists(cfg.checkpoint_path)
    with open(cfg.checkpoint_path) as f:
        recs = list(savefile.parse_records(f))
    # 2 chunks before the final one, 2 curves each
    assert len(recs) >= 2
    assert all(r.b1 < 900 for r in recs)


def test_pairmap_cached_across_curve_batches(tmp_path, monkeypatch):
    """The stage-2 pairmap depends only on (chunk, B1, B2, D, U) — the
    driver must plan each chunk ONCE and replay it for every curve batch
    (the reference plans on thread 0 and shares read-only,
    /root/reference/ecm.c:1449-1459).  With the cache disabled the plan
    reruns per batch; factor results must be identical either way."""
    from tpu_ecm.stage2 import plan as s2plan

    real_pair = s2plan.pair
    calls = []

    def counting_pair(*a, **kw):
        calls.append(a[2])            # chunk lo
        return real_pair(*a, **kw)

    monkeypatch.setattr(driver.s2plan, "pair", counting_pair)

    def run(cache_entries):
        monkeypatch.setenv("TPU_ECM_PAIRMAP_CACHE", str(cache_entries))
        calls.clear()
        cfg = _cfg(tmp_path, n=N71, curves=8, batch=4, b1=300, b2=10000,
                   sigma=110, prime_chunk=4000, stop_on_factor=False)
        res = driver.ECMDriver(cfg).run()
        return sorted((h.factor, h.stage, h.sigma) for h in res.factors)

    hits_cached = run(125_000_000)
    # 3 chunks (300-4300, 4300-8300, 8300-10000) x 2 batches -> 3 plans
    assert len(calls) == 3, calls
    hits_uncached = run(0)
    assert len(calls) == 6, calls
    assert hits_cached == hits_uncached and hits_cached
    # the sigma-112 stage-2 oracle factor is among them
    assert (P35, 2, 112) in hits_cached


# Golden sigma sweep (the reference's test_t35.csh strategy, SURVEY.md
# section 4.2): 128 consecutive pinned sigmas on N71 at B1=2000/B2=2e5; every
# (factor, stage, sigma) hit below was cross-validated on TPU hardware
# against the Pallas engine (identical factor/stage/sigma tuples) on
# 2026-08-16, and the per-entry p/q divisibility of the stage-2 accumulator
# was spot-checked against the pure-int oracle.  Stage attribution is
# sensitive to the stage-1/stage-2 boundary, the PRAC planner, the pairing
# planner, both arithmetic engines, and the grouping-independence of the
# inversion-failure factor harvest (sigma 126's near-miss: an extra
# giant-step point beyond the pairmap would hit infinity mod q and leak a
# grouping-dependent bonus factor if padding rows weren't masked).
GOLDEN_SWEEP = {
    (68719476767, 1, 111), (34359738421, 1, 112), (34359738421, 2, 114),
    (68719476767, 2, 115), (68719476767, 2, 120), (34359738421, 2, 123),
    (68719476767, 2, 124), (68719476767, 1, 125),
    (34359738421, 2, 127), (68719476767, 2, 129), (68719476767, 2, 130),
    (68719476767, 2, 131), (34359738421, 2, 132), (34359738421, 2, 134),
    (34359738421, 2, 137), (68719476767, 2, 144), (68719476767, 2, 148),
    (68719476767, 1, 149), (68719476767, 1, 162), (34359738421, 2, 167),
    (68719476767, 2, 168), (68719476767, 2, 170), (68719476767, 2, 171),
    (34359738421, 1, 174), (34359738421, 2, 176), (68719476767, 2, 177),
    (68719476767, 2, 178), (68719476767, 1, 180), (68719476767, 2, 188),
    (68719476767, 2, 190), (34359738421, 2, 191), (34359738421, 1, 195),
    (34359738421, 2, 196), (34359738421, 2, 198), (34359738421, 2, 199),
    (68719476767, 1, 200), (68719476767, 2, 204), (34359738421, 2, 207),
    (34359738421, 2, 211), (68719476767, 2, 212), (68719476767, 2, 214),
    (34359738421, 1, 215), (34359738421, 2, 216), (34359738421, 2, 217),
    (68719476767, 2, 218), (68719476767, 1, 219), (68719476767, 2, 223),
    (34359738421, 2, 224), (34359738421, 1, 226), (34359738421, 2, 228),
    (68719476767, 2, 229), (68719476767, 2, 230), (34359738421, 2, 231),
    (34359738421, 2, 232), (34359738421, 2, 233), (34359738421, 2, 235),
    (34359738421, 2, 237),
}


def test_golden_sigma_sweep(tmp_path):
    cfg = _cfg(tmp_path, n=N71, curves=128, b1=2000, b2=200000, sigma=110,
               stop_on_factor=False)
    res = driver.ECMDriver(cfg).run()
    got = {(h.factor, h.stage, h.sigma) for h in res.factors}
    assert got == GOLDEN_SWEEP


# The reference's t35 acceptance sweep (test_t35.csh + the curated sigma
# list embedded at /root/reference/ecm.c:2138-2189): 50 sigmas on the
# 90-digit composite, each must surface the P31 factor at B1=1e6/B2=1e8.
# Opt-in (hours on the CPU jnp path; ~100 s on a TPU v5e where it was last
# validated 2026-08-16: 5 stage-1 hits + 45 stage-2 hits, factor
# 1147161816393958657432308670357 for every sigma).
N90_T35 = 142946323174762557214361604817789197531833590620956958433836799929503392464892596183803921
T35_SIGMAS = [
    11919771003873180376, 827341355533811391, 6409678826612327146,
    13778091190526084667, 10019108749973911965, 10593445070074576128,
    16327347202299112611, 13768494887674349585, 17303758977955016383,
    2123812563661387803, 2330438305415445111, 12942218412106273630,
    5427613898610684157, 13727269399001077418, 3087408422684406072,
    8338236510647016635, 18232185847183255223, 5070879816975737551,
    9793972958987869750, 1683842010542383008, 16668736769625151751,
    11148653366342049109, 6736437364141805734, 8860111571919296085,
    15708855786729755459, 4263089024287634346, 10705409183485702771,
    5104801995378138195, 9551766994217130412, 17824508581606173922,
    4444245868135963544, 14755844915853888743, 4749513976499976002,
    3933740986814285076, 2498288573977543008, 18051693002182940438,
    421313926042840093, 1659254194582388863, 13762123388521706810,
    1318769405167840394, 14979751960240161797, 4989253092822783329,
    14628970911725975539, 4759771957864370849, 17870405635651283010,
    472060146, 3776270672, 3954243165, 2576580518, 416265588,
]
T35_FACTOR = 1147161816393958657432308670357


# Two acceptance rows ported from the reference's regression list
# (/root/reference/test.csh:16,13 — the stage-1-only "#passed" cases small
# enough to run in minutes).  Factors and sigmas pinned from a TPU v5e run
# 2026-08-17: each base sigma finds its factor in stage 1, matching the
# reference's pass criterion.
TESTCSH_CASES = [
    # (input, b1, b2, base sigma, expected factor at that sigma, stage)
    (int("1715273161932708715071084358934602467469827122991716223500103230"
         "23149618461701108180621787596877308885636902619030669"),
     250_000, 250_000, 3462348953, 32232915983117755997770028617, 1),
    (int("9204766253166356539084248235108466315091724380490146496419709373"
         "3017673896259378196247891860624551698300716957203"),
     1_000_000, 1_000_000, 1355166397, 934755100218937800337186649945447, 1),
    # 197-digit homogeneous Cunningham (test.csh:9, 648-bit): stage-2 find,
    # fully factors the input (PRP151 cofactor); ~17 min on one v5e chip
    (int("7372793354101765316718587746625129802699896157840083073727933541"
         "0176531671858774662512980269989615784008307372793354101765316718"
         "5877466251298026998961578400830737279335410176531671858774662512"
         "98027"),
     1_500_000, 100_000_000, 987115356,
     18195047252241968932445162733612535247087014043, 2),
]


@pytest.mark.skipif(not os.environ.get("TPU_ECM_SLOW"),
                    reason="test.csh acceptance rows: set TPU_ECM_SLOW=1")
@pytest.mark.parametrize("n,b1,b2,sigma,factor,stage", TESTCSH_CASES)
def test_testcsh_acceptance(tmp_path, n, b1, b2, sigma, factor, stage):
    assert n % factor == 0
    cfg = _cfg(tmp_path, n=n, curves=8, b1=b1, b2=b2, sigma=sigma,
               stop_on_factor=False)
    res = driver.ECMDriver(cfg).run()
    assert any(h.factor == factor and h.stage == stage and h.sigma == sigma
               for h in res.factors), res.factors


@pytest.mark.skipif(not os.environ.get("TPU_ECM_SLOW"),
                    reason="full t35 sweep: set TPU_ECM_SLOW=1 (run on TPU)")
def test_t35_sweep(tmp_path):
    cfg = _cfg(tmp_path, n=N90_T35, curves=128, b1=1_000_000,
               b2=100_000_000, sigma=1, batch=128, stop_on_factor=False)
    d = driver.ECMDriver(cfg)
    sigmas = T35_SIGMAS + [10**6 + i for i in range(128 - len(T35_SIGMAS))]
    d.run_batch(sigmas, 0)
    hit = {h.sigma for h in d.factors if h.factor % T35_FACTOR == 0
           or T35_FACTOR % h.factor == 0 or h.factor == T35_FACTOR}
    missing = [s for s in T35_SIGMAS if s not in hit]
    assert not missing, missing


def test_mersenne_factor_pinned(tmp_path):
    """Mersenne-path factor finds with pinned sigmas (searched on TPU
    2026-08-16): on 2^101-1, sigma 511 hits P13 7432339208719 in stage 1 at
    B1=1e4 and sigma 502 hits it in stage 2 at B2=1e6 — exercises the fold
    arithmetic, the vnhat work-mod-M trick, and both factor paths."""
    m101 = (1 << 101) - 1
    cfg = _cfg(tmp_path, n=m101, curves=12, b1=10_000, b2=1_000_000,
               sigma=500, stop_on_factor=False)
    d = driver.ECMDriver(cfg)
    assert d.ctx.is_mersenne and d.ctx.mersenne_e == 101
    res = d.run()
    hits = {(h.sigma, h.stage) for h in res.factors
            if h.factor == 7432339208719}
    assert (511, 1) in hits, sorted(hits)
    assert (502, 2) in hits, sorted(hits)


def _oracle_stage1_gcd(n, sigma, b1):
    """Exact int replay of the driver's stage 1: gcd(Z, n) at the end."""
    import math

    from tpu_ecm.curve import oracle, prac, suyama
    from tpu_ecm.primes import primes_range as _pr

    ctx = params.make_monty(n)
    dom = oracle.IntDomain(ctx)
    c = suyama.build_one_curve(ctx, sigma)
    X, Z, s = c.x_mont, c.z_mont, c.s_mont
    for _ in range(prac.stage1_powers_of_two(b1)):
        X, Z = oracle.xdbl_int(dom, X, Z, s)
    for qq in _pr(3, b1).tolist():
        qq, k = int(qq), 1
        while True:
            tape = []
            prac.prac_tape(qq, tape)
            X, Z = oracle.run_tape_int(ctx, tape, X, Z, s)[0]
            k *= qq
            if k * qq >= b1:
                break
    rinv = pow(ctx.p.R, -1, n)
    return math.gcd(Z * rinv % n, n)


@pytest.mark.slow
def test_driver_fuzz_random_semiprimes_guaranteed_finds(tmp_path):
    """Seeded driver-level property fuzz: for random ~24-bit semiprimes and
    a random sigma window, every (sigma, p) the group-order oracle
    GUARANTEES at (B1, B2) must be found by the real driver at that stage
    (stage-2 guarantees may land early via x-only collision bonuses, so
    those only require the factor to appear).  Lanes where both prime
    factors are guaranteed are skipped up front; a reported MISS is accepted
    only when the exact int oracle shows that lane's gcd collapsed to n
    itself (an x-only collision bonus on the *other* prime — e.g. its
    residual order after stage 1 is tiny — which the driver must reject as
    trivial, ref ecm.c:2542-2557)."""
    import random

    from tpu_ecm.primes import primes_range
    from tpu_ecm.utils.grouporder import smoothness_verdict

    rng = random.Random(0xD21F)
    pool = primes_range(1 << 24, (1 << 24) + 60000).tolist()
    b1, b2, curves = 1000, 30000, 16
    for trial in range(2):
        p, q = rng.sample(pool, 2)
        p, q = int(p), int(q)
        n = p * q
        base = rng.randrange(100, 10**6)
        verdicts = [(smoothness_verdict(base + i, p, b1, b2),
                     smoothness_verdict(base + i, q, b1, b2))
                    for i in range(curves)]
        cfg = _cfg(tmp_path, n=n, curves=curves, b1=b1, b2=b2,
                   sigma=base, stop_on_factor=False)
        res = driver.ECMDriver(cfg).run()
        checked = 0
        for i, (vp, vq) in enumerate(verdicts):
            for prime, v, other in ((p, vp, vq), (q, vq, vp)):
                if v == "unsmooth" or other != "unsmooth":
                    continue
                hits = [h for h in res.factors
                        if h.sigma == base + i and h.factor % prime == 0]
                if not hits:
                    g = _oracle_stage1_gcd(n, base + i, b1)
                    assert g == n, (
                        f"trial {trial}: sigma {base + i} guaranteed {v} "
                        f"find of {prime} (n={p}*{q}) missing and not a "
                        f"whole-n collision (oracle stage-1 gcd={g})")
                elif v == "stage1":
                    assert any(h.stage == 1 for h in hits), (base + i, prime)
                checked += 1
        # the window sizes make 0 guaranteed lanes astronomically unlikely;
        # if it ever happens the seed must change rather than pass silently
        assert checked > 0, f"trial {trial}: no guaranteed lanes to check"
