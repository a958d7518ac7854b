package graft.ops

import org.jline.reader.{Candidate, EndOfFileException, LineReader,
  LineReaderBuilder, ParsedLine, UserInterruptException}
import org.jline.terminal.{Terminal, TerminalBuilder}

/** Terminal line editing + tab completion for [[CypherRepl]], bound
  * through jline 3 (on the Spark distribution's classpath — no new
  * dependency). The reference binds the same completion list through
  * python readline (repl.py:869-947); here the REPL's pure
  * `complete(text)` surface feeds a jline `Completer`, and the editing
  * loop is `CypherRepl.runWith` — identical dispatch/history/session
  * state to the stream-driven form the specs script.
  *
  * Kept in its own file so jline classes load only when a terminal
  * session actually starts; the REPL core stays stream-only.
  */
object JlineConsole {

  /** jline Completer over the REPL's completion surface: candidates
    * for the word under the cursor (dot-commands, keywords, functions,
    * labels, `var.prop`).
    */
  def completer(repl: CypherRepl): org.jline.reader.Completer =
    new org.jline.reader.Completer {
      override def complete(reader: LineReader, line: ParsedLine,
                            candidates: java.util.List[Candidate]): Unit =
        repl.complete(line.word()).foreach { c =>
          // function candidates end in "(" — mark them incomplete so
          // jline puts the cursor right after the paren, no space
          candidates.add(new Candidate(
            c, c, null, null, null, null, !c.endsWith("(")))
        }
    }

  /** Run the REPL on the system terminal with editing + completion.
    * Ctrl-C clears the current line (returns to a fresh prompt);
    * Ctrl-D at an empty prompt ends the session, as in the reference.
    */
  def run(repl: CypherRepl): Unit = {
    val terminal: Terminal = TerminalBuilder.builder().system(true).build()
    try {
      val reader = LineReaderBuilder.builder()
        .terminal(terminal)
        .appName("graft")
        .completer(completer(repl))
        .build()
      repl.runWith { prompt =>
        try Some(reader.readLine(prompt))
        catch {
          case _: EndOfFileException    => None
          case _: UserInterruptException =>
            // Ctrl-C: abort the line AND any buffered continuation —
            // without the discard, the empty line we hand back would
            // EXECUTE the half-typed statement (empty-line-mid-
            // multiline means "run what's buffered")
            repl.discardPending()
            Some("")
        }
      }
    } finally terminal.close()
  }
}
