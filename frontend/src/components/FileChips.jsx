/** Selected-file chips with per-file remove buttons. */
export default function FileChips({ files, onRemove }) {
  return (
    <div className="chips">
      {files.map((f, i) => (
        <span className="chip" key={`${f.name}-${i}`}>
          {f.name}
          <button type="button" aria-label={`remove ${f.name}`}
                  onClick={() => onRemove(i)}>
            ×
          </button>
        </span>
      ))}
    </div>
  );
}
