package graft

import graft.sources.KafkaWire

/** KIP-482 FLEXIBLE VERSIONS on the negotiation path — the r16
  * verdict's #6: tagged-field/compact encodings for ApiVersions v3
  * and Metadata v9, so this client could negotiate with a modern real
  * broker (which serves the classic pinned versions too, but prefers
  * flexible ones). The double serves BOTH generations from one api
  * table; these specs pin that the two generations agree exactly and
  * that the special cases of the flexible protocol hold:
  *
  *  - ApiVersions v3's RESPONSE header stays v0 (so a client that
  *    guessed too high can still read the error code);
  *  - request header v2 carries a tag buffer after client_id;
  *  - Metadata v9 is field-for-field the v7 view in compact clothes;
  *  - a pre-flexible broker (serveFormat = 1) advertises neither —
  *    the downgrade path stays live. */
class FlexibleVersionsSpec extends SparkSuite {

  test("ApiVersions v3 and v0 advertise the identical api table, and v3 includes itself") {
    val cl = new MiniKafkaCluster(numBrokers = 1, numPartitions = 2)
    try {
      val c = new KafkaWire.Conn("localhost", cl.bootstrapPort)
      try {
        val (e0, v0) = KafkaWire.apiVersions(c)
        val (e3, v3) = KafkaWire.apiVersionsV3(c)
        assert(e0 === 0 && e3 === 0)
        assert(v3 === v0, "one api table, two encodings")
        assert(v3(18) === (0, 3), "the flexible handshake advertises itself")
        assert(v3(3)._2 >= 9, "flexible Metadata advertised")
      } finally c.close()
    } finally cl.stop()
  }

  test("Metadata v9 reports the same cluster view as v7 — brokers, leaders, epochs, ISR") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      // give the partitions some history so epochs differ from 0
      val prod = new KafkaWire.RetryingProducer("localhost",
        cl.bootstrapPort, "t", acks = "all")
      try prod.send(1, Seq(("k".getBytes, "v".getBytes)), 1L)
      finally prod.close()
      cl.moveLeader("t", 1, 0)
      val c = new KafkaWire.Conn("localhost", cl.bootstrapPort)
      try {
        val v7 = KafkaWire.clusterMetadataV7(c, "t")
        val v9 = KafkaWire.clusterMetadataV9(c, "t")
        assert(v9.brokers === v7.brokers)
        assert(v9.leaders === v7.leaders)
        assert(v9.epochs === v7.epochs)
        assert(v9.isr === v7.isr)
        assert(v9.epochOf(1) === cl.leaderEpochOf("t", 1))
      } finally c.close()
    } finally cl.stop()
  }

  test("the negotiating client takes the flexible path when offered and degrades when not") {
    val modern = new MiniKafkaCluster(numBrokers = 1, numPartitions = 2)
    val old = new MiniKafkaServer(numPartitions = 2, serveFormat = 1)
    try {
      // modern: bestClusterMetadata rides ApiVersions v3 → Metadata v9
      val cm = new KafkaWire.Conn("localhost", modern.bootstrapPort)
      try {
        val view = KafkaWire.bestClusterMetadata(cm, "t")
        assert(view.epochs.nonEmpty, "the flexible path carries epochs")
        assert(view.partitions === 2)
      } finally cm.close()
      // old broker: neither flexible api advertised; the client falls
      // back to Metadata v0 — no epochs, fetches un-pinned
      val co = new KafkaWire.Conn("localhost", old.port)
      try {
        val (_, apis) = KafkaWire.apiVersions(co)
        assert(apis(18) === (0, 0) && apis(3) === (0, 0))
        val view = KafkaWire.bestClusterMetadata(co, "t")
        assert(view.epochs.isEmpty, "pre-flexible view has no epochs")
        assert(view.partitions === 2)
      } finally co.close()
    } finally { modern.stop(); old.stop() }
  }
}
