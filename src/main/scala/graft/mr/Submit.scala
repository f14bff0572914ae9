package graft.mr

import org.apache.spark.sql.SparkSession

/** Job-submission facade mirroring the reference's `mapreduce-submit` CLI
  * (reference map_reduce/mapreduce/submit.py:20-98): same options, same
  * defaults, same summary print — but instead of posting a JSON message to
  * a manager socket, it runs the job in-process on Spark (the manager /
  * worker fleet the message would reach is replaced by Spark's scheduler).
  *
  *   runMain graft.mr.Submit -i <inputDir> -o <outputDir> \
  *     -m <mapperCmd> -r <reducerCmd> --nmappers N --nreducers R
  *
  * The mapper/reducer executables keep the reference's streaming contract
  * (lines on stdin → lines on stdout; reduce input sorted with equal keys
  * contiguous) via `rdd.pipe`. Output is byte-compat `part-{i:05d}`.
  */
object Submit {

  // defaults mirror submit.py:30-57
  private case class Args(
      input: String = "tests/testdata/input",
      output: String = "output",
      mapper: String = "tests/testdata/exec/wc_map.sh",
      reducer: String = "tests/testdata/exec/wc_reduce.sh",
      numMappers: Int = 2,
      numReducers: Int = 2)

  private def parse(argv: List[String], acc: Args): Args = argv match {
    case Nil => acc
    case ("--input" | "-i") :: v :: rest => parse(rest, acc.copy(input = v))
    case ("--output" | "-o") :: v :: rest => parse(rest, acc.copy(output = v))
    case ("--mapper" | "-m") :: v :: rest => parse(rest, acc.copy(mapper = v))
    case ("--reducer" | "-r") :: v :: rest => parse(rest, acc.copy(reducer = v))
    case "--nmappers" :: v :: rest => parse(rest, acc.copy(numMappers = v.toInt))
    case "--nreducers" :: v :: rest => parse(rest, acc.copy(numReducers = v.toInt))
    case other :: _ =>
      throw new IllegalArgumentException(s"unknown option: $other")
  }

  // executables run DIRECTLY (shebang honored), exactly like the
  // reference workers exec them — wrapping in /bin/sh would break any
  // non-shell mapper (e.g. a python script)
  private def job(a: Args): PipeMapReduceJob = PipeMapReduceJob(
    inputDir = a.input, outputDir = a.output,
    mapperCmd = Seq(new java.io.File(a.mapper).getAbsolutePath),
    reducerCmd = Seq(new java.io.File(a.reducer).getAbsolutePath),
    numReducers = a.numReducers, numMappers = a.numMappers)

  /** CLI-shaped entry usable from tests: parse args, run, return output dir. */
  def run(spark: SparkSession, argv: Seq[String]): String = {
    val a = parse(argv.toList, Args())
    job(a).run(spark, exactPartNames = true)
    // summary print mirrors submit.py:90-97
    println("Submitted job to Spark")
    println(s"input directory      ${a.input}")
    println(s"output directory     ${a.output}")
    println(s"mapper executable    ${a.mapper}")
    println(s"reducer executable   ${a.reducer}")
    println(s"num mappers          ${a.numMappers}")
    println(s"num reducers         ${a.numReducers}")
    a.output
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toSeq)
    finally spark.stop()
  }
}
