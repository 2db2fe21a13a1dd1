package graft.index;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD build-side distance kernels (jdk.incubator.vector). BUILD-SIDE ONLY:
 * lane-parallel accumulation reassociates float adds, so results are not
 * bit-identical to the sequential-double oracle kernels — exactly the
 * contract of DistanceKernels' float kernels (graph-construction decisions
 * only; every search-result distance comes from the exact kernels).
 *
 * Loaded reflectively by DistanceKernels: the incubator module is present
 * only when the JVM ran with --add-modules=jdk.incubator.vector (build.sbt
 * adds it to forked run/test JVMs), and any loading failure falls back to
 * the scalar float kernels. Primitive-only signatures keep scalac from ever
 * needing the incubator types on ITS classpath.
 */
public final class SimdKernels {
    private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

    private SimdKernels() {}

    public static double l2sqF(float[] a, float[] b) {
        FloatVector acc = FloatVector.zero(S);
        int i = 0;
        int upper = S.loopBound(a.length);
        for (; i < upper; i += S.length()) {
            FloatVector d = FloatVector.fromArray(S, a, i)
                .sub(FloatVector.fromArray(S, b, i));
            acc = d.fma(d, acc);
        }
        float sum = acc.reduceLanes(VectorOperators.ADD);
        for (; i < a.length; i++) {
            float d = a[i] - b[i];
            sum += d * d;
        }
        return (double) sum;
    }

    public static double dotF(float[] a, float[] b) {
        FloatVector acc = FloatVector.zero(S);
        int i = 0;
        int upper = S.loopBound(a.length);
        for (; i < upper; i += S.length()) {
            acc = FloatVector.fromArray(S, a, i)
                .fma(FloatVector.fromArray(S, b, i), acc);
        }
        float sum = acc.reduceLanes(VectorOperators.ADD);
        for (; i < a.length; i++) {
            sum += a[i] * b[i];
        }
        return (double) sum;
    }

    /**
     * Cosine distance with float accumulators, one fused pass. Returns NaN
     * when either norm accumulator lands on 0f — true zero vector OR float
     * underflow — so the caller can delegate that ambiguous case to the
     * exact double kernel (which owns the zero-vector rule).
     */
    public static double cosineDistF(float[] a, float[] b) {
        FloatVector dot = FloatVector.zero(S);
        FloatVector na = FloatVector.zero(S);
        FloatVector nb = FloatVector.zero(S);
        int i = 0;
        int upper = S.loopBound(a.length);
        for (; i < upper; i += S.length()) {
            FloatVector x = FloatVector.fromArray(S, a, i);
            FloatVector y = FloatVector.fromArray(S, b, i);
            dot = x.fma(y, dot);
            na = x.fma(x, na);
            nb = y.fma(y, nb);
        }
        float d = dot.reduceLanes(VectorOperators.ADD);
        float sa = na.reduceLanes(VectorOperators.ADD);
        float sb = nb.reduceLanes(VectorOperators.ADD);
        for (; i < a.length; i++) {
            float x = a[i];
            float y = b[i];
            d += x * y;
            sa += x * x;
            sb += y * y;
        }
        if (sa == 0f || sb == 0f) return Double.NaN;
        return 1.0 - (d / Math.sqrt((double) sa * (double) sb));
    }
}
