package graft

/** Test-data locator with environment override — the analogue of the
  * reference's env-var-or-default data dir resolution
  * (reference: src/test_util/mod.rs:111-167).
  *
  * Resolution order: `GRAFT_TESTDATA` env var, `graft.testdata` system
  * property, `/root/testdata` default.
  */
object TestData {
  def root: String =
    sys.env.get("GRAFT_TESTDATA")
      .orElse(sys.props.get("graft.testdata"))
      .getOrElse("/root/testdata")

  /** Scale-factor directory, e.g. `dir("0.01")` → `<root>/sf0.01`. */
  def dir(sf: String): String = s"$root/sf$sf"
}
