"""Byte-exact interop against the *actual* reference binary.

The fixture ``fixtures/ref_n256_save_b1.txt`` was produced by the reference
itself: ``/root/reference`` built unmodified (gcc 12, ``-march=skylake-avx512
-fcommon``, linked against system libgmp.so.10 via an ABI shim header) and run
on this machine's AVX-512 host CPU as

    avx-ecm <N256> 8 2000 1 2000 110      # stage 1 only (B2 <= B1)

on 2026-08-17.  The build was validated by running the reference's own
acceptance case (test_t35.csh row 1: sigma=11919771003873180376 at
B1=1e6/B2=1e8 finds PRP31 1147161816393958657432308670357 in stage 2).

These tests pin our writer + stage-1 residues byte-for-byte against that
output (the savefile writer contract, /root/reference/ecm.c:1294-1302), and
round-trip foreign GMP-ECM record shapes (/root/reference/README.md:8-10).
"""

import os

import pytest

from tpu_ecm import driver, params
from tpu_ecm.io import savefile

from moduli import N256

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ref_n256_save_b1.txt")


def test_savefile_bytes_match_reference_binary(tmp_path):
    """Run the identical (N, sigma, B1) config the reference binary ran and
    require the resulting save_b1.txt to be byte-for-byte identical —
    format parity AND bit-exact normalized stage-1 residues in one test."""
    sv = str(tmp_path / "save_b1.txt")
    cfg = driver.RunConfig(n=N256, curves=8, b1=2000, b2=2000, sigma=110,
                           save_b1_path=sv, checkpoint_path=None,
                           results_path=str(tmp_path / "r.txt"),
                           cache_dir=str(tmp_path / "cache"), verbose=0)
    driver.ECMDriver(cfg).run()
    with open(FIXTURE, "rb") as f:
        want = f.read()
    with open(sv, "rb") as f:
        got = f.read()
    assert got == want


def test_fixture_parses_and_roundtrips():
    """Our reader consumes the reference-binary file; re-serializing each
    record reproduces the input bytes exactly."""
    with open(FIXTURE) as f:
        recs = list(savefile.parse_records(f))
    assert [r.sigma for r in recs] == list(range(110, 118))
    assert all(r.n == N256 and r.b1 == 2000 for r in recs)
    with open(FIXTURE) as f:
        lines = f.readlines()
    for rec, line in zip(recs, lines):
        assert savefile.format_record(rec) == line


FOREIGN_RECORDS = """\
METHOD=ECM; PARAM=3; SIGMA=1691424438; B1=11000000; N=6277101735386680763835789423207666416102355444464034512895; X=0x2c9e8c5808d5e9206b95b8fa4c28e8d8c9e1e13e4e1aebd03a478a5ee9; PROGRAM=GMP-ECM 7.0.4; Y=0x0; X0=0x0; Y0=0x0; WHO=tester; TIME=Sat Aug 16 12:00:00 2026;
METHOD=ECM; SIGMA=3:12345; B1=50000; N=0xdeadbeefcafebabe1; X=0x1234abcd; PROGRAM=GMP-ECM 7.0.5;
METHOD=P-1; B1=1000; N=123; X=0x1;
"""


def test_foreign_gmp_ecm_records():
    """GMP-ECM writes extra fields (PARAM/Y/X0/WHO/TIME/CHECKSUM), decimal N,
    param:sigma prefixes, and X-only (normalized, Z implied 1) records; the
    reader must take all of these and skip non-ECM methods."""
    import io as _io
    recs = list(savefile.parse_records(_io.StringIO(FOREIGN_RECORDS)))
    assert len(recs) == 2           # P-1 record skipped
    r0, r1 = recs
    assert r0.param == 3 and r0.sigma == 1691424438
    assert r0.n == 6277101735386680763835789423207666416102355444464034512895
    assert r0.z == 1                # X-only record implies Z=1
    assert r1.param == 3 and r1.sigma == 12345 and r1.n == 0xdeadbeefcafebabe1


def test_reference_pseudo_mersenne_truncation_divergence():
    """Root-caused small-N divergence vs the reference binary (documented,
    deliberate): for N71 = 34359738421*68719476767 the smallest
    pseudo-Mersenne relation is 2^107 ≡ 531991829376835 (mod N), a 50-bit c.
    The reference stores c in an ``int`` (/root/reference/main.c:369,438), so
    it truncates to 531991829376835 mod 2^32 = 225091 and silently runs all
    arithmetic mod 2^107-225091 — which N does NOT divide — producing
    unrelated residues and missing factors (verified against the built
    reference binary: it reports no factor for sigma 110..117 at
    B1=2000/B2=2e5, where the true curves hit P35/P36 four times).  Our
    detection keeps full precision, so the special form is usable and
    correct."""
    n = 34359738421 * 68719476767
    e, c = params.detect_mersenne(n)
    assert (e, c) == (107, 531991829376835)
    assert (2**e - c) % n == 0          # ours divides
    c_trunc = c % 2**32
    assert c_trunc == 225091            # what the reference actually uses
    assert (2**e - c_trunc) % n != 0    # ... which is not a multiple of N


def test_malformed_savefile_records():
    """Corrupted ECM records must fail with a clear error naming the line;
    non-ECM/garbage lines are skipped (foreign-tool savefiles can hold
    P-1/P+1 records we don't resume)."""
    import io

    import pytest

    from tpu_ecm.io import savefile

    ok = ("METHOD=ECM; SIGMA=110; B1=2000; N=0x1F; X=0x2; Z=0x3; "
          "PROGRAM=AVX-ECM;\n")
    skipped = ("METHOD=P-1; B1=2000; N=0x1F; X=0x2;\n"
               "random garbage line\n\n")
    recs = list(savefile.parse_records(io.StringIO(skipped + ok)))
    assert len(recs) == 1 and recs[0].sigma == 110

    for bad in (
        "METHOD=ECM; B1=2000; N=0x1F; X=0x2;\n",          # missing SIGMA
        "METHOD=ECM; SIGMA=110; B1=2000; N=0x1F;\n",       # missing X
        "METHOD=ECM; SIGMA=zz; B1=2000; N=0x1F; X=0x2;\n",  # bad int
    ):
        with pytest.raises(ValueError, match="malformed ECM savefile"):
            list(savefile.parse_records(io.StringIO(bad)))
