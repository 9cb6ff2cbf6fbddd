/**
 * Exact longest-common-substring length (suffix automaton of the shorter
 * string, O(|a| + |b|)), computed inside the executor JVM.
 *
 * Algorithm mirrors operators/substring.py::lcs_len exactly - same
 * automaton construction, same cap short-circuit (the verifier only needs
 * span >= min_span, and cur_len grows by 1, so the short-circuit returns
 * exactly cap) - so the two engines produce identical span lengths. Both
 * strings are decoded to CODE POINT arrays first: Python len()/slicing
 * counts code points, so counting UTF-16 units here would overstate spans
 * containing astral characters (each counts 2 units but 1 code point) and
 * break the "spans match exactly" parity claim.
 *
 * The Python per-pair cost measured ~8 ms on ~1 KB pages; this runs in the
 * low hundreds of microseconds.
 *
 * cap <= 0 means "no cap" (full maximum).
 */

import java.util.HashMap;
import org.apache.spark.sql.api.java.UDF3;

public class LcsUdfs implements UDF3<String, String, Integer, Integer> {

    public static int lcsLen(String sa, String sb, int cap) {
        if (sa == null || sb == null || sa.isEmpty() || sb.isEmpty()) return 0;
        int[] a = sa.codePoints().toArray();
        int[] b = sb.codePoints().toArray();
        if (a.length > b.length) { int[] t = a; a = b; b = t; }
        int n = a.length;
        int maxStates = 2 * n + 4;
        @SuppressWarnings("unchecked")
        HashMap<Integer, Integer>[] nxt = new HashMap[maxStates];
        int[] link = new int[maxStates];
        int[] len = new int[maxStates];
        nxt[0] = new HashMap<>();
        link[0] = -1;
        len[0] = 0;
        int size = 1, last = 0;
        for (int i = 0; i < n; i++) {
            int ch = a[i];
            int cur = size++;
            nxt[cur] = new HashMap<>();
            len[cur] = len[last] + 1;
            link[cur] = 0;
            int p = last;
            while (p != -1 && !nxt[p].containsKey(ch)) {
                nxt[p].put(ch, cur);
                p = link[p];
            }
            if (p != -1) {
                int q = nxt[p].get(ch);
                if (len[p] + 1 == len[q]) {
                    link[cur] = q;
                } else {
                    int clone = size++;
                    nxt[clone] = new HashMap<>(nxt[q]);
                    link[clone] = link[q];
                    len[clone] = len[p] + 1;
                    while (p != -1) {
                        Integer to = nxt[p].get(ch);
                        if (to == null || to != q) break;
                        nxt[p].put(ch, clone);
                        p = link[p];
                    }
                    link[q] = clone;
                    link[cur] = clone;
                }
            }
            last = cur;
        }
        int best = 0, curLen = 0, v = 0;
        int m = b.length;
        for (int i = 0; i < m; i++) {
            int ch = b[i];
            while (v != 0 && !nxt[v].containsKey(ch)) {
                v = link[v];
                curLen = len[v];
            }
            Integer to = nxt[v].get(ch);
            if (to != null) {
                v = to;
                curLen++;
                if (curLen > best) {
                    best = curLen;
                    if (cap > 0 && best >= cap) return best;
                }
            } else {
                v = 0;
                curLen = 0;
            }
        }
        return best;
    }

    @Override
    public Integer call(String a, String b, Integer cap) {
        return lcsLen(a, b, cap == null ? 0 : cap);
    }
}
