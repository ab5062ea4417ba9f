package graft.functions;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Panama (jdk.incubator.vector) distance kernels over primitive float
 * arrays — the SIMD twins of {@link VectorMath#distArr}'s hot metrics
 * (L2SQ / IP / COSINE). Mirrors the reference's use of FAISS's AVX
 * kernels (reference delegates all distance math to the FAISS library,
 * which ships hand-written SIMD; cf. reference src/faiss_extension.cpp
 * search paths) — this is the one per-core axis where a scalar JVM
 * loop loses to the native engine.
 *
 * Numeric contract: every per-dimension TERM is computed exactly as
 * the scalar kernel computes it — floats are widened to double BEFORE
 * the subtract/multiply (a float is exact in double, and the
 * difference of two floats is exactly representable in a double's
 * 53-bit mantissa), so the only divergence from the scalar path is the
 * SUM's association order (lane-strided partials + one cross-lane
 * reduce instead of left-to-right). Measured max relative drift vs
 * scalar is ~1e-15 over random data; top-k ORDER is unaffected except
 * for genuine distance ties, which the deterministic (distance, label)
 * heap ordering already breaks by label. ON by default since the r14
 * optimization round (disable with -Dgraft.simd.enabled=false, see
 * {@link VectorMath.Simd}): the full gate suite was A/B-measured
 * row-set bit-equal scalar-vs-SIMD (tools/simd_ab.py) and re-verified
 * against the DuckDB oracle with SIMD on before the flip — quant4
 * rounding and deterministic tie-breaks absorb the ~1e-15 sum drift,
 * and trained-state oracles inject the engine's own state.
 *
 * All incubator types stay INSIDE method bodies: callers compiled by
 * scalac only see primitive signatures, and a JVM launched without
 * --add-modules=jdk.incubator.vector fails this class's load, which
 * the Scala-side gate catches and treats as "unavailable" (scalar
 * fallback, never an error).
 */
public final class SimdKernels {
  private static final VectorSpecies<Float> FS = FloatVector.SPECIES_PREFERRED;
  private static final VectorSpecies<Double> DS = DoubleVector.SPECIES_PREFERRED;
  // same SHAPE (register width) as FS: int lanes match FS's lane count
  // (both 32-bit), byte lanes are 4x — one byte load expands to 4 float
  // vectors via part-indexed convertShape
  private static final VectorSpecies<Integer> IS = IntVector.SPECIES_PREFERRED;
  private static final VectorSpecies<Byte> BS = ByteVector.SPECIES_PREFERRED;

  private SimdKernels() {}

  /** species string for diagnostics/SURVEY (e.g. "Species[float, 16, S_512_BIT]") */
  public static String species() {
    return FS.toString();
  }

  /** squared L2. Terms exact-in-double; sum lane-reassociated. */
  public static double l2sq(float[] a, float[] b) {
    int n = a.length;
    int L = FS.length();
    int upper = n - (n % (2 * L));
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    DoubleVector acc2 = DoubleVector.zero(DS), acc3 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += 2 * L) {
      FloatVector va = FloatVector.fromArray(FS, a, i);
      FloatVector vb = FloatVector.fromArray(FS, b, i);
      FloatVector vc = FloatVector.fromArray(FS, a, i + L);
      FloatVector vd = FloatVector.fromArray(FS, b, i + L);
      DoubleVector d0 = ((DoubleVector) va.convert(VectorOperators.F2D, 0))
          .sub((DoubleVector) vb.convert(VectorOperators.F2D, 0));
      DoubleVector d1 = ((DoubleVector) va.convert(VectorOperators.F2D, 1))
          .sub((DoubleVector) vb.convert(VectorOperators.F2D, 1));
      DoubleVector d2 = ((DoubleVector) vc.convert(VectorOperators.F2D, 0))
          .sub((DoubleVector) vd.convert(VectorOperators.F2D, 0));
      DoubleVector d3 = ((DoubleVector) vc.convert(VectorOperators.F2D, 1))
          .sub((DoubleVector) vd.convert(VectorOperators.F2D, 1));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
      acc2 = d2.fma(d2, acc2);
      acc3 = d3.fma(d3, acc3);
    }
    double s = acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      double d = (double) a[i] - (double) b[i];
      s += d * d;
    }
    return s;
  }

  /** inner product. Terms exact-in-double (float*float fits 48 bits); sum lane-reassociated. */
  public static double ip(float[] a, float[] b) {
    int n = a.length;
    int L = FS.length();
    int upper = n - (n % (2 * L));
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    DoubleVector acc2 = DoubleVector.zero(DS), acc3 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += 2 * L) {
      FloatVector va = FloatVector.fromArray(FS, a, i);
      FloatVector vb = FloatVector.fromArray(FS, b, i);
      FloatVector vc = FloatVector.fromArray(FS, a, i + L);
      FloatVector vd = FloatVector.fromArray(FS, b, i + L);
      acc0 = ((DoubleVector) va.convert(VectorOperators.F2D, 0))
          .fma((DoubleVector) vb.convert(VectorOperators.F2D, 0), acc0);
      acc1 = ((DoubleVector) va.convert(VectorOperators.F2D, 1))
          .fma((DoubleVector) vb.convert(VectorOperators.F2D, 1), acc1);
      acc2 = ((DoubleVector) vc.convert(VectorOperators.F2D, 0))
          .fma((DoubleVector) vd.convert(VectorOperators.F2D, 0), acc2);
      acc3 = ((DoubleVector) vc.convert(VectorOperators.F2D, 1))
          .fma((DoubleVector) vd.convert(VectorOperators.F2D, 1), acc3);
    }
    double s = acc0.add(acc1).add(acc2.add(acc3)).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      s += (double) a[i] * (double) b[i];
    }
    return s;
  }

  /**
   * cosine distance 1 - dot/sqrt(na*nb), zero-vector convention 1.0 —
   * same one-pass dot/na/nb shape as the scalar kernel.
   */
  public static double cosine(float[] a, float[] b) {
    int n = a.length;
    int L = FS.length();
    int upper = n - (n % L);
    DoubleVector dot0 = DoubleVector.zero(DS), dot1 = DoubleVector.zero(DS);
    DoubleVector na0 = DoubleVector.zero(DS), na1 = DoubleVector.zero(DS);
    DoubleVector nb0 = DoubleVector.zero(DS), nb1 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += L) {
      FloatVector va = FloatVector.fromArray(FS, a, i);
      FloatVector vb = FloatVector.fromArray(FS, b, i);
      DoubleVector x0 = (DoubleVector) va.convert(VectorOperators.F2D, 0);
      DoubleVector x1 = (DoubleVector) va.convert(VectorOperators.F2D, 1);
      DoubleVector y0 = (DoubleVector) vb.convert(VectorOperators.F2D, 0);
      DoubleVector y1 = (DoubleVector) vb.convert(VectorOperators.F2D, 1);
      dot0 = x0.fma(y0, dot0);
      dot1 = x1.fma(y1, dot1);
      na0 = x0.fma(x0, na0);
      na1 = x1.fma(x1, na1);
      nb0 = y0.fma(y0, nb0);
      nb1 = y1.fma(y1, nb1);
    }
    double dot = dot0.add(dot1).reduceLanes(VectorOperators.ADD);
    double na = na0.add(na1).reduceLanes(VectorOperators.ADD);
    double nb = nb0.add(nb1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      double x = a[i], y = b[i];
      dot += x * y;
      na += x * x;
      nb += y * y;
    }
    if (na == 0.0 || nb == 0.0) return 1.0;
    return 1.0 - dot / Math.sqrt(na * nb);
  }

  /**
   * SQ8 asymmetric L2^2: uint8 codes decoded against trained per-dim
   * [vmin, vmin+vdiff] bounds, squared distance to the float query —
   * the SIMD twin of {@code Sq.l2DistanceAt}'s V8 branch (the packed
   * coded-list scan's scorer, the serving hot loop of SQ8/IVF-SQ8).
   *
   * Numeric contract, extended from the float kernels to DECODED
   * values: each lane replays the scalar decode's exact float op
   * sequence (int→float convert is exact for 0..255, then div 255f,
   * mul vdiff, add vmin — same three roundings in the same order), so
   * the per-dim decoded value is BIT-equal to the scalar path and the
   * per-dim (q - decoded)^2 term is exact-in-double. Only the final
   * sum is lane-reassociated, exactly as l2sq.
   */
  public static double sqL2u8(
      byte[] code, int off, int width, float[] q, float[] vmin, float[] vdiff) {
    int L = FS.length();
    int BL = BS.length(); // = 4 * L (same shape, byte lanes)
    int upper = width - (width % BL);
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += BL) {
      ByteVector bv = ByteVector.fromArray(BS, code, off + i);
      for (int p = 0; p < 4; p++) {
        int base = i + p * L;
        IntVector iv = (IntVector) bv.convertShape(VectorOperators.B2I, IS, p);
        FloatVector dec = ((FloatVector) iv.and(0xff).convert(VectorOperators.I2F, 0))
            .div(255f)
            .mul(FloatVector.fromArray(FS, vdiff, base))
            .add(FloatVector.fromArray(FS, vmin, base));
        FloatVector qv = FloatVector.fromArray(FS, q, base);
        DoubleVector d0 = ((DoubleVector) qv.convert(VectorOperators.F2D, 0))
            .sub((DoubleVector) dec.convert(VectorOperators.F2D, 0));
        DoubleVector d1 = ((DoubleVector) qv.convert(VectorOperators.F2D, 1))
            .sub((DoubleVector) dec.convert(VectorOperators.F2D, 1));
        acc0 = d0.fma(d0, acc0);
        acc1 = d1.fma(d1, acc1);
      }
    }
    double s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < width; i++) { // tail: the scalar kernel verbatim
      float dec = vmin[i] + (float) (code[off + i] & 0xff) / 255f * vdiff[i];
      double t = (double) q[i] - (double) dec;
      s += t * t;
    }
    return s;
  }

  /**
   * argmin_c l2sq(v, book[c]) with the scalar first-minimum-wins tie
   * rule — the codebook-assignment inner loop of RQ/LSQ encode (per
   * corpus row x stage at build time, THE additive-family build cost
   * at scale). Distances are the lane-reassociated l2sq sums, so an
   * argmin can flip vs the scalar early-abandon loop only on a
   * sub-1e-15-relative near-tie — the same declared contract as the
   * search kernels (and the scalar path remains canonical/default).
   * NaN distances lose every comparison, matching the scalar loop.
   */
  public static int nearestL2(float[][] book, float[] v) {
    int best = 0;
    double bestD = Double.MAX_VALUE;
    for (int c = 0; c < book.length; c++) {
      double d = l2sq(v, book[c]);
      if (d < bestD) {
        bestD = d;
        best = c;
      }
    }
    return best;
  }

  /** l2sq of a query SLICE [qoff, qoff+cen.length) against a
   *  half-dim centroid — the IMI product-quantized coarse assignment
   *  (per corpus row at build). Terms exact-in-double as l2sq. */
  public static double l2sqOff(float[] q, int qoff, float[] cen) {
    int n = cen.length;
    int L = FS.length();
    int upper = n - (n % L);
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += L) {
      FloatVector va = FloatVector.fromArray(FS, q, qoff + i);
      FloatVector vb = FloatVector.fromArray(FS, cen, i);
      DoubleVector d0 = ((DoubleVector) va.convert(VectorOperators.F2D, 0))
          .sub((DoubleVector) vb.convert(VectorOperators.F2D, 0));
      DoubleVector d1 = ((DoubleVector) va.convert(VectorOperators.F2D, 1))
          .sub((DoubleVector) vb.convert(VectorOperators.F2D, 1));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
    }
    double s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      double t = (double) q[qoff + i] - (double) cen[i];
      s += t * t;
    }
    return s;
  }

  /**
   * l2sq with FLOAT-rounded terms — the k-means assignment loop's
   * arithmetic (`val t = v(i) - cen(i); d += t * t` with float t):
   * per-lane float sub and mul replay the scalar roundings exactly,
   * the product widens to double for accumulation, and as everywhere
   * only the sum's association order differs from scalar.
   */
  public static double l2sqF(float[] a, float[] b) {
    int n = a.length;
    int L = FS.length();
    int upper = n - (n % L);
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += L) {
      FloatVector t = FloatVector.fromArray(FS, a, i)
          .sub(FloatVector.fromArray(FS, b, i));
      FloatVector tt = t.mul(t);
      acc0 = acc0.add((DoubleVector) tt.convert(VectorOperators.F2D, 0));
      acc1 = acc1.add((DoubleVector) tt.convert(VectorOperators.F2D, 1));
    }
    double s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      float t = a[i] - b[i];
      s += (double) (t * t);
    }
    return s;
  }

  /** argmin_c l2sqF(v, centers[c]) over the first k centers — the
   *  k-means assignment step (first-minimum-wins, as the scalar). */
  public static int nearestF(float[][] centers, int k, float[] v) {
    int best = 0;
    double bestD = Double.MAX_VALUE;
    for (int c = 0; c < k; c++) {
      double d = l2sqF(v, centers[c]);
      if (d < bestD) {
        bestD = d;
        best = c;
      }
    }
    return best;
  }

  /**
   * One output dimension of the PCA/OPQ pre-transform:
   * sum_i c[i] * (v[i] - mean[i]) — float sub and mul replayed per
   * lane exactly as the scalar loop rounds them (the precision
   * contract the PCA oracle replays), product widened to double for
   * accumulation; only the sum's association order differs.
   */
  public static double pcaTerm(float[] c, float[] v, float[] mean) {
    int n = mean.length;
    int L = FS.length();
    int upper = n - (n % L);
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += L) {
      FloatVector t = FloatVector.fromArray(FS, v, i)
          .sub(FloatVector.fromArray(FS, mean, i))
          .mul(FloatVector.fromArray(FS, c, i));
      acc0 = acc0.add((DoubleVector) t.convert(VectorOperators.F2D, 0));
      acc1 = acc1.add((DoubleVector) t.convert(VectorOperators.F2D, 1));
    }
    double s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      s += c[i] * (v[i] - mean[i]);
    }
    return s;
  }

  /** l2sq of a double residual against a float centroid — the LSQ ICM
   *  re-pick inner loop after the candidate-invariant residual hoist.
   *  Per-term ops (widen, sub, square) replay the scalar double
   *  sequence per lane; sum lane-reassociated as everywhere. */
  public static double l2sqDF(double[] a, float[] b) {
    int n = a.length;
    int L = FS.length();
    int DL = DS.length(); // = L / 2 (same register width)
    int upper = n - (n % L);
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    int i = 0;
    for (; i < upper; i += L) {
      FloatVector fb = FloatVector.fromArray(FS, b, i);
      DoubleVector d0 = DoubleVector.fromArray(DS, a, i)
          .sub((DoubleVector) fb.convert(VectorOperators.F2D, 0));
      DoubleVector d1 = DoubleVector.fromArray(DS, a, i + DL)
          .sub((DoubleVector) fb.convert(VectorOperators.F2D, 1));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
    }
    double s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      double t = a[i] - (double) b[i];
      s += t * t;
    }
    return s;
  }

  /** argmin_c l2sqDF(u, book[c]) — {@link #nearestL2}'s twin for the
   *  hoisted-double-residual shape (LSQ ICM re-pick). Mirrors the
   *  scalar ICM loop's init: -1 when every distance is NaN (the caller
   *  skips the re-pick), not a silent re-pick of centroid 0. */
  public static int nearestL2D(float[][] book, double[] u) {
    int best = -1;
    double bestD = Double.MAX_VALUE;
    for (int c = 0; c < book.length; c++) {
      double d = l2sqDF(u, book[c]);
      if (d < bestD) {
        bestD = d;
        best = c;
      }
    }
    return best;
  }

  /**
   * Residual/additive-quantizer asymmetric L2^2: the stored value is
   * the float SUM of {@code width} full-dim codebook centroids (stage
   * order), distance is exact double L2 to the query — the SIMD twin
   * of {@code Rq.l2DistanceAt} (shared by the RQ and LSQ scorers).
   *
   * The decode accumulates per-dim in float IN STAGE ORDER within each
   * lane — the identical op sequence to the scalar scratch loop, so
   * decoded values are BIT-equal (lanes are independent; reassociation
   * only ever touches the final distance sum). Registers replace the
   * scratch buffer entirely: the decoded block never touches memory.
   */
  public static double rqL2(
      byte[] code, int off, int width, float[] q, float[][][] books) {
    int dim = books[0][0].length;
    int L = FS.length();
    int upper = dim - (dim % L);
    DoubleVector acc0 = DoubleVector.zero(DS), acc1 = DoubleVector.zero(DS);
    for (int base = 0; base < upper; base += L) {
      FloatVector dec = FloatVector.zero(FS);
      for (int st = 0; st < width; st++) {
        dec = dec.add(FloatVector.fromArray(FS, books[st][code[off + st] & 0xff], base));
      }
      FloatVector qv = FloatVector.fromArray(FS, q, base);
      DoubleVector d0 = ((DoubleVector) qv.convert(VectorOperators.F2D, 0))
          .sub((DoubleVector) dec.convert(VectorOperators.F2D, 0));
      DoubleVector d1 = ((DoubleVector) qv.convert(VectorOperators.F2D, 1))
          .sub((DoubleVector) dec.convert(VectorOperators.F2D, 1));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
    }
    double s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (int i = upper; i < dim; i++) { // tail: scalar decode + term
      float dec = 0f;
      for (int st = 0; st < width; st++) {
        dec += books[st][code[off + st] & 0xff][i];
      }
      double t = (double) q[i] - (double) dec;
      s += t * t;
    }
    return s;
  }
}
