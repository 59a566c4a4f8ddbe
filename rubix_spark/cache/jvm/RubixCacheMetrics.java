package rubixspark.metrics;

import java.lang.management.ManagementFactory;
import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

import javax.management.Attribute;
import javax.management.AttributeList;
import javax.management.AttributeNotFoundException;
import javax.management.DynamicMBean;
import javax.management.MBeanAttributeInfo;
import javax.management.MBeanInfo;
import javax.management.MBeanServer;
import javax.management.ObjectName;

/**
 * JMX surface for the cache counters — the reference's fourth metrics sink
 * (rubix-common/.../BookKeeperMetrics.java selects JMX alongside StatsD and
 * Ganglia via rubix.metrics.reporters; the JmxReporter there exports each
 * codahale counter as an MBean attribute).
 *
 * A Python driver cannot host MBeans itself, but the Spark driver JVM it sits
 * on can: this DynamicMBean is a concurrent map of gauge values that
 * cache/metrics.py's JMXReporter registers in the driver's platform MBean
 * server (via the py4j gateway) and refreshes from CacheManager.stats() on the
 * reporter cadence. Any JMX client attached to the driver JVM (jconsole, JMX
 * exporters, Spark's own JmxSink) then reads the cache counters under the
 * rubix_spark.cache domain — the same pull-based story the reference offers.
 *
 * DynamicMBean (not a static XxxMBean interface) so the attribute set tracks
 * whatever stats() returns: new counters appear without recompiling the shim.
 */
public class RubixCacheMetrics implements DynamicMBean {
    private final Map<String, Double> values = new ConcurrentHashMap<>();

    /** Reporter-facing setter: upsert one gauge. */
    public void put(String name, double value) {
        values.put(name, value);
    }

    // MBean-server plumbing lives here rather than in Python: JDK 17 strong
    // encapsulation hides the platform MBeanServer's implementation class
    // (com.sun.jmx.*) from py4j's reflection, so the py4j side can only call
    // methods on classes it can see — this one.

    /** Register this bean in the platform MBean server under the given name. */
    public void register(String objectName) throws Exception {
        ManagementFactory.getPlatformMBeanServer().registerMBean(this, new ObjectName(objectName));
    }

    /** Unregister the given name if present (idempotent). */
    public static void unregister(String objectName) throws Exception {
        MBeanServer mbs = ManagementFactory.getPlatformMBeanServer();
        ObjectName o = new ObjectName(objectName);
        if (mbs.isRegistered(o)) {
            mbs.unregisterMBean(o);
        }
    }

    public static boolean registered(String objectName) throws Exception {
        return ManagementFactory.getPlatformMBeanServer().isRegistered(new ObjectName(objectName));
    }

    /** JMX-client read path: a platform-MBean-server getAttribute, as jconsole does. */
    public static Object attribute(String objectName, String attr) throws Exception {
        return ManagementFactory.getPlatformMBeanServer()
            .getAttribute(new ObjectName(objectName), attr);
    }

    /** JMX-client metadata path: the attribute inventory from getMBeanInfo. */
    public static String[] attributeNames(String objectName) throws Exception {
        MBeanAttributeInfo[] infos = ManagementFactory.getPlatformMBeanServer()
            .getMBeanInfo(new ObjectName(objectName)).getAttributes();
        String[] out = new String[infos.length];
        for (int i = 0; i < infos.length; i++) {
            out[i] = infos[i].getName();
        }
        return out;
    }

    @Override
    public Object getAttribute(String name) throws AttributeNotFoundException {
        Double v = values.get(name);
        if (v == null) {
            throw new AttributeNotFoundException(name);
        }
        return v;
    }

    @Override
    public void setAttribute(Attribute attribute) throws AttributeNotFoundException {
        // gauges are engine-owned; external writes are not part of the contract
        throw new AttributeNotFoundException(attribute.getName() + " is read-only");
    }

    @Override
    public AttributeList getAttributes(String[] names) {
        AttributeList out = new AttributeList();
        for (String n : names) {
            Double v = values.get(n);
            if (v != null) {
                out.add(new Attribute(n, v));
            }
        }
        return out;
    }

    @Override
    public AttributeList setAttributes(AttributeList attributes) {
        return new AttributeList();
    }

    @Override
    public Object invoke(String actionName, Object[] params, String[] signature) {
        return null;
    }

    @Override
    public MBeanInfo getMBeanInfo() {
        MBeanAttributeInfo[] attrs = values.keySet().stream().sorted().map(
            k -> new MBeanAttributeInfo(
                k, "java.lang.Double", "rubix_spark cache gauge " + k,
                true, false, false)
        ).toArray(MBeanAttributeInfo[]::new);
        return new MBeanInfo(
            getClass().getName(), "rubix_spark cache counters", attrs,
            null, null, null);
    }
}
