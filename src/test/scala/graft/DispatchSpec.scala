package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Readers
import graft.io.Readers.FileSource

/** S7 file-type dispatcher (reference `db_get_file_types`,
  * dashboard/callbacks.py:43-157) and the O3/O6 listing probes
  * (callbacks.py:49-53, 747-750) over the checked-in device fixtures. */
class DispatchSpec extends AnyFunSuite {

  private val fixtures = s"${sys.props("user.dir")}/src/test/resources/io"

  private def tmpZip(entries: (String, String)*): String = {
    val f = File.createTempFile("dispatch_", ".zip")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new FileOutputStream(f))
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    f.getAbsolutePath
  }

  test("EDF with an ECG0 channel routes to Actiwave") {
    assert(Readers.dispatch(s"$fixtures/actiwave.edf") == FileSource.Actiwave)
  }

  test("EDF that fails the ECG probe is invalid") {
    val f = File.createTempFile("bogus_", ".edf")
    f.deleteOnExit()
    Files.write(f.toPath, Array.fill[Byte](512)('0'))
    assert(Readers.dispatch(f.getAbsolutePath) == FileSource.Invalid)
  }

  test("ZIP with the full E4 manifest routes to E4") {
    assert(Readers.dispatch(s"$fixtures/e4.zip") == FileSource.E4)
  }

  test("ZIP of per-subject CSVs routes to batch, ignoring OS metadata") {
    val zip = tmpZip(
      "session/" -> "",
      "session/alpha.csv" -> "Timestamp,ECG\n1,0.5\n",
      "session/beta.csv" -> "Timestamp,ECG\n1,0.6\n",
      "__MACOSX/session/._alpha.csv" -> "junk",
      "session/.DS_Store" -> "junk")
    assert(Readers.dispatch(zip) == FileSource.Batch)
  }

  test("ZIP with a non-CSV payload entry is invalid") {
    val zip = tmpZip(
      "session/alpha.csv" -> "Timestamp,ECG\n1,0.5\n",
      "session/notes.txt" -> "not a csv")
    assert(Readers.dispatch(zip) == FileSource.Invalid)
  }

  test("bare CSV routes to the mapped-CSV reader; unknown extensions bounce") {
    assert(Readers.dispatch("/anywhere/upload.csv") == FileSource.Csv)
    assert(Readers.dispatch("/anywhere/upload.CSV") == FileSource.Csv)
    assert(Readers.dispatch("/anywhere/upload.parquet") == FileSource.Unknown)
  }

  test("O3 latestFile: newest mtime wins, name breaks ties") {
    val dir = Files.createTempDirectory("latest_")
    val a = dir.resolve("a.csv"); val b = dir.resolve("b.csv")
    Files.writeString(a, "x"); Files.writeString(b, "y")
    a.toFile.setLastModified(1700000000000L)
    b.toFile.setLastModified(1700000005000L)
    assert(Readers.latestFile(dir.toString).contains(b.toString))
    assert(Readers.latestFile("/nonexistent_dir_xyz").isEmpty)
  }

  test("O6 sortedBatchCsvs: sorted, visible, csv-only") {
    val got = Readers.sortedBatchCsvs(s"$fixtures/batch")
    assert(got.map(p => new File(p).getName) == Seq("alpha.csv", "beta.csv", "gamma.csv"))
    val dir = Files.createTempDirectory("batch_")
    Files.writeString(dir.resolve("z.csv"), "x")
    Files.writeString(dir.resolve(".hidden.csv"), "x")
    Files.writeString(dir.resolve("a.txt"), "x")
    Files.writeString(dir.resolve("a.csv"), "x")
    assert(Readers.sortedBatchCsvs(dir.toString).map(p => new File(p).getName)
      == Seq("a.csv", "z.csv"))
  }
}
