package rubixspark.locality;

import java.io.IOException;
import java.net.URI;
import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;
import java.security.NoSuchAlgorithmException;
import java.util.ArrayList;
import java.util.Arrays;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.BlockLocation;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Locality shim: a Hadoop FileSystem under the {@code rubix://} scheme that serves
 * bytes from the local filesystem but FABRICATES block locations from the cache
 * ownership ring — the reference's CachingFileSystem.getFileBlockLocations trick
 * (rubix-core/src/main/java/com/qubole/rubix/core/CachingFileSystem.java:393-437),
 * re-derived for Spark's scan path: FileSourceScanExec asks this FileSystem for block
 * locations when building FilePartitions, so scan tasks carry the ring owner as their
 * preferred location and the scheduler places them on the node whose cache holds the
 * split (with spark.locality.wait.node > 0).
 *
 * The rendezvous hash MUST stay bit-identical to rubix_spark/cache/ring.py:
 * weight(key, node) = first 8 bytes of md5(key + "|" + node), unsigned big-endian;
 * owner(key) = the first maximal node in sorted node order;
 * ownership key for the split [s, e) of path p = p + s + e (decimal-formatted),
 * matching the reference's path + startOffset + endOffset key shape
 * (CachingFileSystem.java:424).
 *
 * Config (read from the Hadoop Configuration, i.e. spark.hadoop.* confs):
 *   rubix.cache.nodes        comma-separated executor hostnames (required; without it
 *                            block locations fall back to the local FS answer)
 *   rubix.cache.split.bytes  ring split size, default 268435456 (256 MiB —
 *                            CacheConfig.java:181)
 *   rubix.remote.latency.ms  synthetic per-open round-trip latency, default 0. Makes
 *                            the delegate behave like the slow object store the cache
 *                            exists for (deployment drills / cold-vs-warm benchmarks);
 *                            an actual object-store deployment instead swaps the
 *                            RawLocalFileSystem base for the store's FileSystem.
 */
public class RubixLocalFileSystem extends RawLocalFileSystem {

    public static final String SCHEME = "rubix";
    public static final String NODES_KEY = "rubix.cache.nodes";
    public static final String SPLIT_KEY = "rubix.cache.split.bytes";
    public static final String LATENCY_KEY = "rubix.remote.latency.ms";
    public static final long DEFAULT_SPLIT = 256L * 1024 * 1024;

    // static: RawLocalFileSystem's constructor calls getUri() (via
    // getInitialWorkingDirectory) before subclass field initializers run
    private static final URI NAME = URI.create(SCHEME + ":///");

    @Override
    public String getScheme() {
        return SCHEME;
    }

    @Override
    public URI getUri() {
        return NAME;
    }

    static long weight(String key, String node) {
        final MessageDigest md;
        try {
            md = MessageDigest.getInstance("MD5");
        } catch (NoSuchAlgorithmException e) {
            throw new RuntimeException(e);
        }
        byte[] d = md.digest((key + "|" + node).getBytes(StandardCharsets.UTF_8));
        long w = 0L;
        for (int i = 0; i < 8; i++) {
            w = (w << 8) | (d[i] & 0xffL);
        }
        return w;
    }

    /** First maximal node in sorted order — matches Python's max(sorted(nodes), key=...). */
    static String locateKey(String key, String[] sortedNodes) {
        String best = null;
        long bestW = 0L;
        for (String n : sortedNodes) {
            long w = weight(key, n);
            if (best == null || Long.compareUnsigned(w, bestW) > 0) {
                best = n;
                bestW = w;
            }
        }
        return best;
    }

    @Override
    public FSDataInputStream open(Path f, int bufferSize) throws IOException {
        long ms = getConf().getLong(LATENCY_KEY, 0L);
        if (ms > 0L) {
            try {
                Thread.sleep(ms);
            } catch (InterruptedException e) {
                Thread.currentThread().interrupt();
                throw new IOException("interrupted during injected remote latency", e);
            }
        }
        return super.open(f, bufferSize);
    }

    @Override
    public BlockLocation[] getFileBlockLocations(FileStatus file, long start, long len)
            throws IOException {
        String[] nodes = getConf().getStrings(NODES_KEY);
        if (file == null || nodes == null || nodes.length == 0) {
            return super.getFileBlockLocations(file, start, len);
        }
        if (start < 0 || len < 0) {
            throw new IllegalArgumentException("invalid range " + start + "+" + len);
        }
        String[] sorted = nodes.clone();
        Arrays.sort(sorted);
        long split = getConf().getLong(SPLIT_KEY, DEFAULT_SPLIT);
        // the ring key uses the scheme-less path, exactly what the Python side hashes
        String path = file.getPath().toUri().getPath();
        long size = file.getLen();
        long nSplits = Math.max(1L, (size + split - 1) / split);
        ArrayList<BlockLocation> out = new ArrayList<>();
        for (long i = 0; i < nSplits; i++) {
            long s = i * split;
            long e = Math.min(size, s + split);
            if (e <= start || s >= start + len) {
                continue;
            }
            String owner = locateKey(path + s + e, sorted);
            out.add(new BlockLocation(
                    new String[] {owner + ":0"}, new String[] {owner}, s, e - s));
        }
        return out.toArray(new BlockLocation[0]);
    }
}
