package graft.fuzz

import java.nio.file.{Files, Paths}

import graft.Engine

/** Wide cross-engine fuzz sweep (dev harness). The frozen `fz*`/
  * `fzj*`/`fzs*` rows give the driver a standing cross-engine sample;
  * this main dumps an ARBITRARY seed range of generated plans in
  * `Verify`'s exact output layout (result parquet per query +
  * `oracle_sql.json` of DuckDB renderings), so
  * `scripts/selfcheck.py <sfDir> <outDir>` replays the whole sweep
  * against DuckDB with no extra compare code.
  *
  * Usage: runMain graft.fuzz.FuzzDump <sfDir> <outDir> <kind> <from> <to>
  * where kind ∈ base|join|scalar|composite|frame|rframe|aggfns|rollup|subq|chain3|distinct|gsets|nullord|asof|limitby|withfill|qualify|distwin|timebucket|arragg.
  */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println(
        "usage: FuzzDump <sfDir> <outDir> <base|join|scalar|composite|frame|rframe|aggfns|rollup|subq|chain3|distinct|gsets|nullord> <fromSeed> <toSeed>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, kind, fromS, toS) = args.take(5)
    val gen: Long => PlanGen.Generated = kind match {
      case "base"      => PlanGen.generate
      case "join"      => PlanGen.generateJoin
      case "scalar"    => PlanGen.generateScalar
      case "composite" => PlanGen.generateComposite
      case "frame"     => PlanGen.generateFrame
      case "rframe"    => PlanGen.generateRangeFrame
      case "aggfns"    => PlanGen.generateAggFns
      case "rollup"    => PlanGen.generateRollup
      case "subq"      => PlanGen.generateSubq
      case "chain3"    => PlanGen.generateChain3
      case "distinct"  => PlanGen.generateDistinct
      case "gsets"     => PlanGen.generateGroupingSets
      case "nullord"   => PlanGen.generateNullOrder
      case "asof"      => PlanGen.generateAsof
      case "limitby"   => PlanGen.generateLimitBy
      case "withfill"  => PlanGen.generateWithFill
      case "qualify"   => PlanGen.generateQualify
      case "distwin"   => PlanGen.generateDistWin
      case "timebucket" => PlanGen.generateTimeBucket
      case "arragg"    => PlanGen.generateArrAgg
      case "pivot"     => PlanGen.generatePivot
      case "explode"   => PlanGen.generateExplode
      case "datearith" => PlanGen.generateDateArith
      case "using"     => PlanGen.generateUsing
      case "filteragg" => PlanGen.generateFilterAgg
      case "stragg"    => PlanGen.generateStrAgg
      case "values"    => PlanGen.generateValues
      case "sugar"     => PlanGen.generateSugar
      case "condfn"    => PlanGen.generateCondFn
      case "arrfn"     => PlanGen.generateArrFn
      case "unpivot"   => PlanGen.generateUnpivot
      case "lateral"   => PlanGen.generateLateral
      case "setop"     => PlanGen.generateSetOp
      case "ignul"     => PlanGen.generateIgnoreNulls
      case "tryar"     => PlanGen.generateTryArith
      case "storage"   => PlanGen.generateStorage
      case "mapfn"     => PlanGen.generateMapFn
      case "strfn"     => PlanGen.generateStrFn
      case "chsql"     => PlanGen.generateChSql
      case "chnested"  => PlanGen.generateChNested
      // -text kinds sweep the OTHER leg: the CH-dialect text through
      // the ChSql rewriter (parser → Catalyst), instead of the
      // DataFrame build — so arbitrary seed ranges of the rewriter
      // itself replay against DuckDB, not just the frozen rows and the
      // in-suite 1-100 sweeps.
      case "chsqltext" => PlanGen.generateChSql
      case "chntext"   => PlanGen.generateChNested
      case other       => sys.error(s"unknown kind $other")
    }
    val textLeg = kind.endsWith("text")
    val spark = Engine.session()
    new java.io.File(outDir).mkdirs()
    val seeds = fromS.toLong to toS.toLong
    var oracles = Map.empty[String, String]
    var failed = 0
    seeds.foreach { s =>
      val g = gen(s)
      val name = s"sweep_${kind}_$s"
      try {
        val df =
          if (textLeg) {
            Engine.registerAll(spark, sfDir)
            graft.ChSql.sql(spark, g.sparkSql)
          } else g.build(spark, sfDir)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        oracles += name -> g.duckSql
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzzdump] $name (shape ${g.shape}) failed: ${e.getMessage}")
      }
    }
    def q(str: String): String = "\"" + str.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    println(s"""{"fuzzdump":"$kind","seeds":${seeds.size},"built":${oracles.size},"failed":$failed}""")
    spark.stop()
  }
}
